"""elasticexporter translation semantics, ported from
exporter/elasticexporter/internal/translator/elastic/
{traces,exceptions,metadata}_test.go."""

import pyarrow as pa

from opentelemetry_collector_contrib_ray.stages.elastic_apm import (
    ElasticSpanEncoder,
    encode_resource_metadata,
    exception_events_to_errors,
    parse_java_stacktrace,
)


def _t(rows):
    keys = sorted({k for r in rows for k in r})
    return pa.table({k: [r.get(k) for r in rows] for k in keys})


def _enc(rows, attr_cols=()):
    return ElasticSpanEncoder(attr_cols=attr_cols)(_t(rows)).to_pandas()


_IDS = dict(trace_id="01" * 16, span_id="02" * 8, start_ns=0, end_ns=1_000_000)


class TestRouting:
    # TestEncodeSpan: root or server kind → transaction, else span
    def test_root_and_server_are_transactions(self):
        out = _enc(
            [
                dict(name="root", **_IDS),
                dict(name="server-child", parent_span_id="03" * 8, kind="server", **_IDS),
                dict(name="client-child", parent_span_id="03" * 8, kind="client", **_IDS),
            ]
        )
        assert list(out["record"]) == ["transaction", "transaction", "span"]
        assert out.iloc[0]["duration_ms"] == 1.0

    # TestEncodeSpanStatus
    def test_status_outcome(self):
        out = _enc(
            [
                dict(name="unset", status_code=0, **_IDS),
                dict(name="ok", status_code=1, **_IDS),
                dict(name="err", status_code=2, **_IDS),
            ]
        )
        assert list(out["outcome"]) == ["", "success", "failure"]
        assert list(out["result"]) == ["", "OK", "Error"]


class TestTransactionURL:
    # TestTransactionHTTPRequestURL subtests
    def _full(self, attrs):
        row = dict(name="tx", **_IDS, **attrs)
        out = _enc([row], attr_cols=list(attrs))
        return out.iloc[0]["url_full"]

    def test_scheme_host_target(self):
        assert self._full(
            {"http.scheme": "https", "http.host": "testing.invalid:80",
             "http.target": "/foo?bar"}
        ) == "https://testing.invalid:80/foo?bar"

    def test_scheme_servername_nethostport_target(self):
        assert self._full(
            {"http.scheme": "https", "http.server_name": "testing.invalid",
             "net.host.port": 80, "http.target": "/foo?bar"}
        ) == "https://testing.invalid:80/foo?bar"

    def test_scheme_nethostname_nethostport_target(self):
        assert self._full(
            {"http.scheme": "https", "net.host.name": "testing.invalid",
             "net.host.port": 80, "http.target": "/foo?bar"}
        ) == "https://testing.invalid:80/foo?bar"

    def test_http_url(self):
        url = "https://testing.invalid:80/foo?bar"
        assert self._full({"http.url": url}) == url

    def test_host_no_port(self):
        assert self._full(
            {"http.scheme": "https", "http.host": "testing.invalid",
             "http.target": "/foo?bar"}
        ) == "https://testing.invalid/foo?bar"

    def test_ipv6_host_no_port(self):
        assert self._full(
            {"http.scheme": "https", "http.host": "[::1]",
             "http.target": "/foo?bar"}
        ) == "https://[::1]/foo?bar"

    def test_default_scheme(self):
        assert self._full(
            {"http.host": "testing.invalid:80", "http.target": "/foo?bar"}
        ) == "http://testing.invalid:80/foo?bar"

    # TestTransactionHTTPRequestURLInvalid
    def test_invalid_url_becomes_label(self):
        row = dict(name="tx", **_IDS)
        row["http.url"] = "0.0.0.0:8081"
        out = _enc([row], attr_cols=["http.url"])
        r = out.iloc[0]
        assert r["type"] == "unknown"  # no Request model
        assert r["url_full"] == ""
        assert r["labels"] == "http_url=0.0.0.0:8081"

    # TestTransactionHTTPRequestSocketRemoteAddr
    def test_remote_addr(self):
        base = dict(name="tx", **_IDS)
        out = _enc(
            [
                {**base, "http.url": "http://testing.invalid",
                 "net.peer.ip": "192.168.0.1", "net.peer.port": 1234},
                {**base, "http.url": "http://testing.invalid",
                 "net.peer.ip": "192.168.0.1"},
                {**base, "http.url": "http://testing.invalid",
                 "http.remote_addr": "192.168.0.1:1234"},
                {**base, "http.url": "http://testing.invalid",
                 "http.remote_addr": "192.168.0.1"},
            ],
            attr_cols=["http.url", "net.peer.ip", "net.peer.port",
                       "http.remote_addr"],
        )
        assert list(out["remote_addr"]) == [
            "192.168.0.1:1234", "192.168.0.1", "192.168.0.1:1234", "192.168.0.1",
        ]


def _span_row(attrs):
    return dict(name="sp", parent_span_id="03" * 8, kind="client", **_IDS, **attrs)


class TestSpanHTTP:
    # TestSpanHTTPURL subtests
    def _url(self, attrs):
        out = _enc([_span_row(attrs)], attr_cols=list(attrs))
        return out.iloc[0]["http_url"]

    def test_http_url(self):
        url = "https://testing.invalid:80/foo?bar"
        assert self._url({"http.url": url}) == url

    def test_scheme_host_target(self):
        assert self._url(
            {"http.scheme": "https", "http.host": "testing.invalid:80",
             "http.target": "/foo?bar"}
        ) == "https://testing.invalid:80/foo?bar"

    def test_scheme_netpeername_netpeerport_target(self):
        # net.peer.name preferred over net.peer.ip
        assert self._url(
            {"http.scheme": "https", "net.peer.name": "testing.invalid",
             "net.peer.ip": "::1", "net.peer.port": 80,
             "http.target": "/foo?bar"}
        ) == "https://testing.invalid:80/foo?bar"

    def test_scheme_netpeerip_netpeerport_target(self):
        assert self._url(
            {"http.scheme": "https", "net.peer.ip": "::1",
             "net.peer.port": 80, "http.target": "/foo?bar"}
        ) == "https://[::1]:80/foo?bar"

    def test_default_scheme(self):
        assert self._url(
            {"http.host": "testing.invalid:80", "http.target": "/foo?bar"}
        ) == "http://testing.invalid:80/foo?bar"

    # TestSpanHTTPDestination subtests
    def _dest(self, attrs):
        out = _enc([_span_row(attrs)], attr_cols=list(attrs))
        r = out.iloc[0]
        return (r["dest_address"], r["dest_port"],
                r["dest_service_name"], r["dest_service_resource"])

    def test_url_default_port_specified(self):
        assert self._dest({"http.url": "https://testing.invalid:443/foo?bar"}) == (
            "testing.invalid", 443, "https://testing.invalid", "testing.invalid:443",
        )

    def test_url_port_scheme(self):
        assert self._dest({"http.url": "https://testing.invalid/foo?bar"}) == (
            "testing.invalid", 443, "https://testing.invalid", "testing.invalid:443",
        )

    def test_url_non_default_port(self):
        assert self._dest({"http.url": "https://testing.invalid:444/foo?bar"}) == (
            "testing.invalid", 444, "https://testing.invalid:444",
            "testing.invalid:444",
        )

    def test_scheme_host_target(self):
        assert self._dest(
            {"http.scheme": "https", "http.host": "testing.invalid:444",
             "http.target": "/foo?bar"}
        ) == ("testing.invalid", 444, "https://testing.invalid:444",
              "testing.invalid:444")

    def test_scheme_netpeerip_netpeerport_target(self):
        assert self._dest(
            {"http.scheme": "https", "net.peer.ip": "::1",
             "net.peer.port": 444, "http.target": "/foo?bar"}
        ) == ("::1", 444, "https://[::1]:444", "[::1]:444")

    # TestSpanHTTPURLInvalid
    def test_invalid_url_becomes_label(self):
        out = _enc([_span_row({"http.url": "0.0.0.0:8081"})],
                   attr_cols=["http.url"])
        r = out.iloc[0]
        assert r["type"] == "app"  # no HTTP model
        assert r["http_url"] == ""
        assert r["labels"] == "http_url=0.0.0.0:8081"

    # TestSpanHTTPStatusCode: status alone still creates the HTTP model
    def test_status_code_only(self):
        out = _enc([_span_row({"http.status_code": 200})],
                   attr_cols=["http.status_code"])
        r = out.iloc[0]
        assert r["http_status"] == 200
        assert r["type"] == "external"
        assert r["dest_service_name"] == ""  # no URL context


class TestSpanDatabase:
    # TestSpanDatabaseContext
    def test_database_context(self):
        conn = "Server=shopdb.example.com;Database=ShopDb;Uid=billing_user;"
        attrs = {
            "db.system": "mysql",
            "db.connection_string": conn,
            "db.user": "billing_user",
            "db.name": "ShopDb",
            "db.statement": "SELECT * FROM orders WHERE order_id = 'o4711'",
            "net.peer.name": "shopdb.example.com",
            "net.peer.ip": "192.0.2.12",
            "net.peer.port": 3306,
            "net.transport": "IP.TCP",
        }
        out = _enc([_span_row(attrs)], attr_cols=list(attrs))
        r = out.iloc[0]
        assert r["type"] == "db"
        assert r["subtype"] == "mysql"
        assert r["dest_address"] == "shopdb.example.com"
        assert r["dest_port"] == 3306
        assert r["dest_service_name"] == "mysql"
        assert r["dest_service_resource"] == "mysql"
        # unmapped attrs → cleaned labels
        assert r["labels"] == f"db_connection_string={conn};net_transport=IP.TCP"


class TestJavaExceptions:
    # TestEncodeSpanEventsJavaExceptions
    def test_simple_stacktrace(self):
        stack = (
            "Exception in thread \"main\" java.lang.RuntimeException: Test exception\n"
            "\tat com.example.GenerateTrace.methodB(GenerateTrace.java:13)\n"
            "\tat com.example.GenerateTrace.methodA(GenerateTrace.java:9)\n"
            "\tat com.example.GenerateTrace.main(GenerateTrace.java:5)\n"
            "\tat com.sun.javafx.application.LauncherImpl.launchApplication1(LauncherImpl.java)\n"
            "\tat java.base/java.lang.Thread.run(Unknown Source)\n"
        )
        out = parse_java_stacktrace(stack)
        assert len(out["frames"]) == 5
        f0 = out["frames"][0]
        assert f0 == {
            "module": "", "classname": "com.example.GenerateTrace",
            "function": "methodB", "file": "GenerateTrace.java", "line": 13,
        }
        # no line number → 0
        assert out["frames"][3]["line"] == 0
        # module prefix split
        f4 = out["frames"][4]
        assert f4["module"] == "java.base"
        assert f4["classname"] == "java.lang.Thread"
        assert f4["function"] == "run"
        assert out["cause"] is None

    def test_caused_by_and_more(self):
        stack = (
            "HighLevelException: MidLevelException: LowLevelException\n"
            "\tat junit.framework.TestCase.runTest(TestCase.java:154)\n"
            "\tat junit.framework.TestCase.runBare(TestCase.java:127)\n"
            "Caused by: MidLevelException: LowLevelException\n"
            "\tat Junk.c(Junk.java:23)\n"
            "\t... 1 more\n"
        )
        out = parse_java_stacktrace(stack)
        assert len(out["frames"]) == 2
        cause = out["cause"]
        assert cause["message"] == "MidLevelException: LowLevelException"
        # 1 own frame + last 1 frame copied from the enclosing stack
        assert len(cause["frames"]) == 2
        assert cause["frames"][1]["function"] == "runBare"
        assert cause["handled"] == out["handled"]

    def test_more_than_enclosing_raises(self):
        stack = (
            "X\n"
            "\tat A.b(A.java:1)\n"
            "Caused by: Y\n"
            "\t... 5 more\n"
        )
        try:
            parse_java_stacktrace(stack)
            assert False, "expected ValueError"
        except ValueError:
            pass

    # TestEncodeSpanEventsJavaExceptionsUnparsedStacktrace /
    # TestEncodeSpanEventsNonJavaExceptions
    def test_event_fallbacks(self):
        import pandas as pd

        df = pd.DataFrame(
            [
                dict(event_name="exception", exc_type="E", exc_message="m",
                     exc_stacktrace="garbage\nnot a frame", exc_escaped=False,
                     trace_id="t", span_id="s"),
                dict(event_name="exception", exc_type="", exc_message="",
                     exc_stacktrace="", exc_escaped=False, trace_id="t",
                     span_id="s"),
                dict(event_name="other", exc_type="E", exc_message="m",
                     exc_stacktrace="", exc_escaped=False, trace_id="t",
                     span_id="s"),
                dict(event_name="exception", exc_type="E", exc_message="",
                     exc_stacktrace="", exc_escaped=True, trace_id="t",
                     span_id="s"),
            ]
        )
        out = exception_events_to_errors(df, language="java")
        # rows 2 and 3 skipped (no type/message; wrong event name)
        assert len(out) == 2
        r0 = out.iloc[0]
        # unparseable stacktrace → plain attribute fallback
        assert r0["n_frames"] == 0
        assert r0["stacktrace_attr"] == "garbage\nnot a frame"
        r1 = out.iloc[1]
        assert r1["message"] == "[EMPTY]"
        assert not r1["handled"]  # escaped → unhandled


class TestMetadata:
    def test_metadata_defaults_and_cleaning(self):
        md = encode_resource_metadata(
            {
                "service.name": "foo.bar/baz",
                "telemetry.sdk.name": "otlp",
                "telemetry.sdk.language": "java",
                "telemetry.sdk.version": "1.0",
                "k8s.namespace.name": "ns",
                "k8s.pod.name": "pod-1",
                "host.name": "h1",
                "custom.label": "v",
            }
        )
        assert md["service"]["name"] == "foo_bar_baz"
        assert md["service"]["agent"] == {"name": "otlp/java", "version": "1.0"}
        assert md["system"]["hostname"] == "h1"
        assert md["system"]["kubernetes"]["namespace"] == "ns"
        assert md["system"]["kubernetes"]["pod"]["name"] == "pod-1"
        assert md["labels"] == {"custom_label": "v"}

    def test_required_defaults(self):
        md = encode_resource_metadata({})
        assert md["service"]["name"] == "unknown"
        assert md["service"]["agent"] == {"name": "otlp", "version": "unknown"}
        assert "system" not in md
