"""X-Ray exporter translation tests, ported from
``exporter/awsxrayexporter/translator/{segment,http,cause,aws,sql}_test.go``.
Pure-Python (no Ray session needed except the stage batch test which runs
on plain Arrow tables)."""

import json

import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.sources.traces import XRaySegmentDecoder
from opentelemetry_collector_contrib_ray.stages.xray_export import (
    ORIGIN_EB,
    ORIGIN_EC2,
    ORIGIN_ECS,
    ORIGIN_ECS_EC2,
    ORIGIN_ECS_FARGATE,
    ORIGIN_EKS,
    XRaySegmentEncoder,
    convert_to_amazon_trace_id,
    determine_aws_origin,
    fix_annotation_key,
    fix_segment_name,
    make_aws,
    make_cause,
    make_http,
    make_segment,
    make_sql,
    parse_exception,
    segment_to_json,
)

EPOCH_NOW = 1_600_000_000


def _tid(n: int = 1) -> str:
    return f"{EPOCH_NOW:08x}" + f"{n:024x}"


def _span(
    attrs=None,
    kind="client",
    parent="bb" * 8,
    status="unset",
    message=None,
    events=None,
    name="test",
):
    return {
        "trace_id": _tid(),
        "span_id": "aa" * 8,
        "parent_span_id": parent,
        "name": name,
        "kind": kind,
        "start_ns": (EPOCH_NOW - 90) * 1_000_000_000,
        "end_ns": EPOCH_NOW * 1_000_000_000,
        "status_code": status,
        "status_message": message,
        "attrs": attrs or {},
        "events": events or [],
    }


def _default_resource():
    # segment_test.go:720-754 constructDefaultResource
    return {
        "service.name": "signup_aggregator",
        "service.version": "semver:1.1.4",
        "container.name": "signup_aggregator",
        "container.image.name": "otel/signupaggregator",
        "container.image.tag": "v1",
        "k8s.cluster.name": "production",
        "k8s.namespace.name": "default",
        "k8s.deployment.name": "signup_aggregator",
        "k8s.pod.name": "signup_aggregator-x82ufje83",
        "cloud.provider": "aws",
        "cloud.account.id": "123456789",
        "cloud.region": "us-east-1",
        "cloud.availability_zone": "us-east-1c",
        "string.key": "string",
        "int.key": 10,
        "double.key": 5.0,
        "bool.key": True,
        "map.key": {"key1": 1, "key2": "value"},
        "array.key": ["foo", "bar"],
    }


def _seg(span, resource=None, indexed=None, index_all=False):
    return make_segment(
        span,
        resource if resource is not None else _default_resource(),
        indexed,
        index_all,
        epoch_now=EPOCH_NOW,
    )


# ----------------------------------------------------- name / id helpers


def test_fix_segment_name():  # segment_test.go:327-337
    valid = "EP @ test_15.testing-d\u00f6main.org#GO"
    assert fix_segment_name(valid) == valid
    assert fix_segment_name("<subDomain>.example.com") == "subDomain.example.com"
    assert fix_segment_name("<>") == "span"


def test_fix_annotation_key():  # segment_test.go:339-346
    assert fix_annotation_key("Key_1") == "Key_1"
    assert fix_annotation_key("Key@1") == "Key_1"


def test_trace_id_conversion():
    out = convert_to_amazon_trace_id(_tid(7), EPOCH_NOW)
    assert out == f"1-{EPOCH_NOW:08x}-{7:024x}"
    # expired (segment_test.go:315-325)
    old = f"{EPOCH_NOW - 60 * 60 * 24 * 30:08x}" + "0" * 24
    with pytest.raises(ValueError):
        convert_to_amazon_trace_id(old, EPOCH_NOW)
    # future beyond skew
    future = f"{EPOCH_NOW + 600:08x}" + "0" * 24
    with pytest.raises(ValueError):
        convert_to_amazon_trace_id(future, EPOCH_NOW)


# ------------------------------------------------------------- makeHTTP


def test_client_span_url_attribute():  # http_test.go:27-45
    _, http = make_http(
        _span({"http.method": "GET", "http.url": "https://api.example.com/users/junit",
               "http.status_code": 200})
    )
    assert http["request"]["url"] == "https://api.example.com/users/junit"
    assert http["response"]["status"] == 200


def test_client_span_scheme_host_target():  # http_test.go:47-68
    filtered, http = make_http(
        _span({"http.method": "GET", "http.scheme": "https",
               "http.host": "api.example.com", "http.target": "/users/junit",
               "http.status_code": 200, "user.id": "junit"})
    )
    assert http["request"]["url"] == "https://api.example.com/users/junit"
    assert filtered == {"user.id": "junit"}


def test_client_span_peer_attributes():  # http_test.go:70-95
    _, http = make_http(
        _span({"http.method": "GET", "http.scheme": "http",
               "net.peer.name": "kb234.example.com", "net.peer.port": 8080,
               "net.peer.ip": "10.8.17.36", "http.target": "/users/junit",
               "http.status_code": 200})
    )
    assert http["request"]["client_ip"] == "10.8.17.36"
    assert http["request"]["url"] == "http://kb234.example.com:8080/users/junit"


def test_client_span_http_peer_preferred():  # http_test.go:97-109
    _, http = make_http(
        _span({"http.client_ip": "1.2.3.4", "net.peer.ip": "10.8.17.36"})
    )
    assert http["request"]["client_ip"] == "1.2.3.4"


def test_client_span_peer_ip4():  # http_test.go:111-130
    _, http = make_http(
        _span({"http.method": "GET", "http.scheme": "http",
               "net.peer.ip": "10.8.17.36", "net.peer.port": "8080",
               "http.target": "/users/junit"})
    )
    assert http["request"]["url"] == "http://10.8.17.36:8080/users/junit"


def test_client_span_peer_ip6_default_port():  # http_test.go:132-151
    _, http = make_http(
        _span({"http.method": "GET", "http.scheme": "https",
               "net.peer.ip": "2001:db8:85a3::8a2e:370:7334",
               "net.peer.port": "443", "http.target": "/users/junit"})
    )
    assert (
        http["request"]["url"]
        == "https://2001:db8:85a3::8a2e:370:7334/users/junit"
    )


def test_server_span_servername_port():  # http_test.go:198-220
    _, http = make_http(
        _span({"http.method": "GET", "http.scheme": "https",
               "http.server_name": "api.example.com", "http.host_port": 443,
               "http.target": "/users/junit", "http.client_ip": "192.168.15.32",
               "http.status_code": 200}, kind="server")
    )
    assert http["request"]["url"] == "https://api.example.com/users/junit"


def test_server_span_hostname_port_and_event_size():  # http_test.go:222-246
    span = _span(
        {"http.method": "GET", "http.scheme": "http",
         "host.name": "kb234.example.com", "http.host_port": 8080,
         "http.target": "/users/junit", "http.client_ip": "192.168.15.32",
         "http.status_code": 200},
        kind="server",
        events=[{"name": "", "attrs": {"message.type": "RECEIVED",
                                       "message.uncompressed_size": 12452}}],
    )
    _, http = make_http(span)
    assert http["request"]["url"] == "http://kb234.example.com:8080/users/junit"
    assert http["response"]["content_length"] == 12452


def test_span_not_enough_url_attributes():  # http_test.go:248-272
    span = _span(
        {"http.method": "GET", "http.scheme": "http",
         "http.client_ip": "192.168.15.32",
         "http.user_agent": "PostmanRuntime/7.21.0",
         "http.target": "/users/junit", "http.host_port": 443,
         "net.peer.port": 8080, "http.status_code": 200},
        kind="server",
        events=[{"name": "", "attrs": {"message.type": "RECEIVED",
                                       "message.uncompressed_size": 12452}}],
    )
    _, http = make_http(span)
    assert "url" not in http["request"]
    assert http["request"]["client_ip"] == "192.168.15.32"
    assert http["request"]["method"] == "GET"
    assert http["request"]["user_agent"] == "PostmanRuntime/7.21.0"
    assert http["response"]["content_length"] == 12452
    assert http["response"]["status"] == 200


# ------------------------------------------------------------- makeCause


def _id_gen():
    n = iter(range(1000))
    return lambda: f"{next(n):016x}"


def test_cause_with_exceptions():  # cause_test.go:27-73
    span = _span(
        {}, kind="server", status="error", message="this is a test",
        events=[
            {"name": "exception", "attrs": {
                "exception.type": "java.lang.IllegalStateException",
                "exception.message": "bad state",
                "exception.stacktrace": (
                    "java.lang.IllegalStateException: state is not legal\n"
                    "\tat io.opentelemetry.sdk.trace.RecordEventsReadableSpanTest"
                    ".recordException(RecordEventsReadableSpanTest.java:626)\n"
                    "\tat java.base/jdk.internal.reflect.NativeMethodAccessorImpl"
                    ".invoke0(Native Method)\n"
                    "\tat java.base/jdk.internal.reflect.NativeMethodAccessorImpl"
                    ".invoke(NativeMethodAccessorImpl.java:62)\n"
                    "Caused by: java.lang.IllegalArgumentException: bad argument"
                )}},
            {"name": "exception", "attrs": {"exception.type": "EmptyError"}},
        ],
    )
    filtered, _ = make_http(span)
    res = {"telemetry.sdk.language": "java"}
    is_error, is_fault, is_throttle, fr, cause = make_cause(
        span, filtered, res, _id_gen()
    )
    assert is_fault and not is_error and not is_throttle
    assert fr == filtered
    exc = cause["exceptions"]
    assert len(exc) == 3
    assert exc[0]["id"]
    assert exc[0]["type"] == "java.lang.IllegalStateException"
    assert exc[0]["message"] == "bad state"
    assert len(exc[0]["stack"]) == 3
    assert exc[0]["cause"] == exc[1]["id"]
    assert exc[1]["type"] == "java.lang.IllegalArgumentException"
    assert exc[2]["type"] == "EmptyError"
    assert exc[2]["message"] == ""


def test_cause_with_status_message():  # cause_test.go:75-100
    span = _span(
        {"http.method": "POST", "http.url": "https://api.example.com/widgets",
         "http.status_code": 500},
        kind="server", status="error", message="this is a test",
    )
    filtered, _ = make_http(span)
    is_error, is_fault, is_throttle, _, cause = make_cause(
        span, filtered, {}, _id_gen()
    )
    assert is_fault and not is_error and not is_throttle
    assert cause["exceptions"][0]["message"] == "this is a test"


def test_cause_with_http_status_message():  # cause_test.go:102-127
    span = _span(
        {"http.method": "POST", "http.url": "https://api.example.com/widgets",
         "http.status_code": 500, "http.status_text": "this is a test"},
        kind="server", status="error",
    )
    filtered, _ = make_http(span)
    _, is_fault, _, fr, cause = make_cause(span, filtered, {}, _id_gen())
    assert is_fault
    assert cause["exceptions"][0]["message"] == "this is a test"
    assert "http.status_text" not in fr


def test_cause_with_zero_status_message():  # cause_test.go:129-151
    span = _span(
        {"http.method": "POST", "http.url": "https://api.example.com/widgets",
         "http.status_code": 500, "http.status_text": "this is a test"},
        kind="server", status="unset",
    )
    filtered, _ = make_http(span)
    is_error, is_fault, is_throttle, _, cause = make_cause(
        span, filtered, {}, _id_gen()
    )
    assert not is_error and not is_fault and not is_throttle
    assert cause is None


def test_cause_client_error_and_throttle():  # cause_test.go:153-193
    for code, (err, fault, thr) in ((499, (True, False, False)),
                                    (429, (True, False, True))):
        span = _span(
            {"http.method": "POST", "http.url": "https://api.example.com/w",
             "http.status_code": code, "http.status_text": "this is a test"},
            kind="server", status="error",
        )
        filtered, _ = make_http(span)
        is_error, is_fault, is_throttle, _, cause = make_cause(
            span, filtered, {}, _id_gen()
        )
        assert (is_error, is_fault, is_throttle) == (err, fault, thr)
        assert cause is not None


# ------------------------------------------------------- parseException


JAVA_STACK = """java.lang.IllegalStateException: state is not legal
\tat io.opentelemetry.sdk.trace.RecordEventsReadableSpanTest.recordException(RecordEventsReadableSpanTest.java:626)
\tat java.base/jdk.internal.reflect.NativeMethodAccessorImpl.invoke0(Native Method)
\tat java.base/jdk.internal.reflect.NativeMethodAccessorImpl.invoke(NativeMethodAccessorImpl.java:62)"""


def test_parse_exception_without_stacktrace():  # cause_test.go:217-241
    exc = parse_exception("com.foo.Exception", "Error happened", "", "")
    assert len(exc) == 1
    assert exc[0]["type"] == "com.foo.Exception"
    assert exc[0]["message"] == "Error happened"
    assert "stack" not in exc[0]


def test_parse_exception_java_no_cause():  # cause_test.go:243-267
    exc = parse_exception("com.foo.Exception", "Error happened", JAVA_STACK, "java")
    assert len(exc) == 1
    st = exc[0]["stack"]
    assert len(st) == 3
    assert st[0]["label"] == (
        "io.opentelemetry.sdk.trace.RecordEventsReadableSpanTest.recordException"
    )
    assert st[0]["path"] == "RecordEventsReadableSpanTest.java"
    assert st[0]["line"] == 626
    assert st[1]["label"] == "jdk.internal.reflect.NativeMethodAccessorImpl.invoke0"
    assert st[1]["path"] == "Native Method"
    assert st[1]["line"] == 0
    assert st[2]["line"] == 62


def test_parse_exception_stacktrace_not_java():  # cause_test.go:269-284
    exc = parse_exception("com.foo.Exception", "Error happened", JAVA_STACK, "")
    assert len(exc) == 1
    assert "stack" not in exc[0]


def test_parse_exception_java_cause_without_stacktrace():  # cause_test.go:286-316
    st = JAVA_STACK + "\nCaused by: java.lang.IllegalArgumentException: bad argument"
    exc = parse_exception("com.foo.Exception", "Error happened", st, "java")
    assert len(exc) == 2
    assert len(exc[0]["stack"]) == 3
    assert exc[0]["cause"] == exc[1]["id"]
    assert exc[1]["type"] == "java.lang.IllegalArgumentException"
    assert exc[1]["message"] == "bad argument"
    assert exc[1]["stack"] == []


def test_parse_exception_java_cause_with_stacktrace():  # cause_test.go:350-388
    st = JAVA_STACK + """
Caused by: java.lang.IllegalArgumentException: bad argument
\tat org.junit.platform.engine.support.hierarchical.ThrowableCollector.execute(ThrowableCollector.java:73)
\tat org.junit.platform.engine.support.hierarchical.NodeTestTask.executeRecursively(NodeTestTask.java)"""
    exc = parse_exception("com.foo.Exception", "Error happened", st, "java")
    assert len(exc) == 2
    assert exc[1]["message"] == "bad argument"
    st1 = exc[1]["stack"]
    assert len(st1) == 2
    assert st1[0]["label"] == (
        "org.junit.platform.engine.support.hierarchical.ThrowableCollector.execute"
    )
    assert st1[0]["path"] == "ThrowableCollector.java"
    assert st1[0]["line"] == 73
    assert st1[1]["path"] == "NodeTestTask.java"
    assert st1[1]["line"] == 0


def test_parse_exception_java_skip_suppressed_malformed():  # cause_test.go:390-443
    st = """java.lang.IllegalStateException: state is not legal
\tat io.opentelemetry.sdk.trace.RecordEventsReadableSpanTest.recordException(RecordEventsReadableSpanTest.java:626)
\tat java.base/jdk.internal.reflect.NativeMethodAccessorImpl.invoke0(Native Method)
\tat java.base/jdk.internal.reflect.NativeMethodAccessorImpl.invoke(NativeMethodAccessorImpl.java:62)
\tat java.base/jdk.internal.reflect.NativeMethodAccessorImpl.invoke(NativeMethodAccessorImpl.java:62)afaefaef
\tat java.base/jdk.internal.reflect.NativeMethodAccessorImpl.invoke
\tat java.base/jdk.internal.reflect.NativeMethodAccessorImpl.invoke(NativeMethodAccessorImpl.java:62
\tat java.base/java.util.ArrayList.forEach(ArrayList.java:)
\tSuppressed: Resource$CloseFailException: Resource ID = 2
\t\tat Resource.close(Resource.java:26)\t
\t\tat Foo3.main(Foo3.java:5)
\tSuppressed: Resource$CloseFailException: Resource ID = 1
\t\tat Resource.close(Resource.java:26)
\t\tat Foo3.main(Foo3.java:5)
Caused by: java.lang.IllegalArgumentException: bad argument
\tat org.junit.platform.engine.support.hierarchical.ThrowableCollector.execute(ThrowableCollector.java:73)
\tat org.junit.platform.engine.support.hierarchical.NodeTestTask.executeRecursively(NodeTestTask.java)
\t... 99 more"""
    exc = parse_exception("com.foo.Exception", "Error happened", st, "java")
    assert len(exc) == 2
    st0 = exc[0]["stack"]
    assert len(st0) == 4
    assert st0[3]["label"] == "java.util.ArrayList.forEach"
    assert st0[3]["path"] == "ArrayList.java"
    assert st0[3]["line"] == 0
    assert len(exc[1]["stack"]) == 2


PY_STACK_WITH_CAUSE = """Traceback (most recent call last):
  File "bar.py", line 10, in greet_many
    greet(person)
  File "foo.py", line 5, in greet
    print(greeting + ', ' + who_to_greet(someone))
ValueError: bad value

During handling of the above exception, another exception occurred:

Traceback (most recent call last):
  File "main.py", line 14, in <module>
    greet_many(['Chad', 'Dan', 1])
  File "greetings.py", line 12, in greet_many
    print('hi, ' + person)
TypeError: must be str, not int"""


def test_parse_exception_python_no_cause():  # cause_test.go:445-468
    st = """Traceback (most recent call last):
  File "main.py", line 14, in <module>
    greet_many(['Chad', 'Dan', 1])
  File "greetings.py", line 12, in greet_many
    print('hi, ' + person)
TypeError: must be str, not int"""
    exc = parse_exception("TypeError", "must be str, not int", st, "python")
    assert len(exc) == 1
    s = exc[0]["stack"]
    assert len(s) == 2
    assert s[0] == {"path": "greetings.py", "label": "greet_many", "line": 12}
    assert s[1] == {"path": "main.py", "label": "<module>", "line": 14}


def test_parse_exception_python_with_cause():  # cause_test.go:470-513
    exc = parse_exception(
        "TypeError", "must be str, not int", PY_STACK_WITH_CAUSE, "python"
    )
    assert len(exc) == 2
    assert exc[1]["type"] == "ValueError"
    assert exc[1]["message"] == "bad value"
    s1 = exc[1]["stack"]
    assert s1[0] == {"path": "foo.py", "label": "greet", "line": 5}
    assert s1[1] == {"path": "bar.py", "label": "greet_many", "line": 10}
    assert exc[0]["cause"] == exc[1]["id"]


def test_parse_exception_python_multiline_cause():  # cause_test.go:515-560
    st = PY_STACK_WITH_CAUSE.replace(
        "ValueError: bad value", "ValueError: bad value\nwith more on\nnew lines"
    )
    exc = parse_exception("TypeError", "must be str, not int", st, "python")
    assert len(exc) == 2
    assert exc[1]["message"] == "bad value\nwith more on\nnew lines"


def test_parse_exception_python_malformed_lines():  # cause_test.go:562-592
    st = """Traceback (most recent call last):
  File "main.py", line 14 in <module>
    greet_many(['Chad', 'Dan', 1])
  File "main.py", lin 14, in <module>
    greet_many(['Chad', 'Dan', 1])
  File "main.py", line 14, fin <module>
    greet_many(['Chad', 'Dan', 1])
  File "greetings.py", line 12, in greet_many
    print('hi, ' + person)
TypeError: must be str, not int"""
    exc = parse_exception("TypeError", "must be str, not int", st, "python")
    assert len(exc) == 1
    s = exc[0]["stack"]
    assert len(s) == 3
    assert s[0] == {"path": "greetings.py", "label": "greet_many", "line": 12}
    assert s[1] == {"path": "main.py", "label": "", "line": 14}
    assert s[2] == {"path": "main.py", "label": "<module>", "line": 0}


def test_parse_exception_python_malformed_cause():  # cause_test.go:594-622
    st = """Traceback (most recent call last):
ValueError: bad value

During handling of the above exception, another exception occurred:

Traceback (most recent call last):
  File "main.py", line 14, in <module>
    greet_many(['Chad', 'Dan', 1])
  File "greetings.py", line 12, in greet_many
    print('hi, ' + person)
TypeError: must be str, not int"""
    exc = parse_exception("TypeError", "must be str, not int", st, "python")
    assert len(exc) == 1
    assert len(exc[0]["stack"]) == 2


def test_parse_exception_javascript():  # cause_test.go:658-694
    st = """TypeError: Cannot read property 'value' of null
    at speedy (/home/gbusey/file.js:6:11)
    at makeFaster (/home/gbusey/file.js:5:3)
    at Object.<anonymous> (/home/gbusey/file.js:10:1)
    at node.js:906:3
    at Array.forEach (native)
    at native"""
    exc = parse_exception(
        "TypeError", "Cannot read property 'value' of null", st, "javascript"
    )
    s = exc[0]["stack"]
    assert len(s) == 6
    assert s[0] == {"path": "/home/gbusey/file.js", "label": "speedy ", "line": 6}
    assert s[1] == {"path": "/home/gbusey/file.js", "label": "makeFaster ", "line": 5}
    assert s[2] == {
        "path": "/home/gbusey/file.js", "label": "Object.<anonymous> ", "line": 10
    }
    assert s[3] == {"path": "node.js", "label": "", "line": 906}
    assert s[4] == {"path": "native", "label": "Array.forEach ", "line": 0}
    assert s[5] == {"path": "native", "label": "", "line": 0}


def test_parse_exception_javascript_malformed():  # cause_test.go:713-731
    st = """TypeError: Cannot read property 'value' of null
    at speedy (/home/gbusey/file.js)
    at makeFaster (/home/gbusey/file.js:5:3)malformed123
    at Object.<anonymous> (/home/gbusey/file.js:10"""
    exc = parse_exception(
        "TypeError", "Cannot read property 'value' of null", st, "javascript"
    )
    s = exc[0]["stack"]
    assert len(s) == 1
    assert s[0] == {"path": "/home/gbusey/file.js", "label": "speedy ", "line": 0}


def test_parse_exception_dotnet():  # cause_test.go:733-765
    st = """System.FormatException: Input string was not in a correct format.
\tat System.Number.ThrowOverflowOrFormatException(ParsingStatus status, TypeCode type)
\tat System.Int32.Parse(String s)
\tat MyNamespace.IntParser.Parse(String s) in C:\\apps\\MyNamespace\\IntParser.cs:line 11
\tat MyNamespace.Program.Main(String[] args) in C:\\apps\\MyNamespace\\Program.cs:line 12"""
    exc = parse_exception(
        "System.FormatException", "Input string was not in a correct format",
        st, "dotnet",
    )
    s = exc[0]["stack"]
    assert len(s) == 4
    assert s[0] == {
        "path": "",
        "label": "System.Number.ThrowOverflowOrFormatException(ParsingStatus status, TypeCode type)",
        "line": 0,
    }
    assert s[2] == {
        "path": "C:\\apps\\MyNamespace\\IntParser.cs",
        "label": "MyNamespace.IntParser.Parse(String s)",
        "line": 11,
    }
    assert s[3]["line"] == 12


def test_parse_exception_dotnet_malformed():  # cause_test.go:802-823
    st = """System.Exception: test
\tat integration_test_app.Controllers.AppController.OutgoingHttp() in /Users/b/AppController.cs:line 21
\tat Microsoft.AspNetCore.Diagnostics.DeveloperExceptionPageMiddleware.Invoke(HttpContext context malformed
\tat System.Net.Http.HttpConnectionPool.ConnectAsync(HttpRequestMessage request, Boolean allowHttp2, CancellationToken cancellationToken) non-malformed"""
    exc = parse_exception("System.Exception", "test", st, "dotnet")
    s = exc[0]["stack"]
    assert len(s) == 2
    assert s[0] == {
        "path": "/Users/b/AppController.cs",
        "label": "integration_test_app.Controllers.AppController.OutgoingHttp()",
        "line": 21,
    }
    assert s[1]["label"].endswith("CancellationToken cancellationToken)")
    assert s[1]["path"] == ""


# ----------------------------------------------------------- MakeSegment


def test_client_span_with_aws_sdk():  # segment_test.go:45-73
    seg = _seg(
        _span(
            {"http.method": "POST", "http.scheme": "https",
             "http.host": "dynamodb.us-east-1.amazonaws.com",
             "http.target": "/", "aws.service": "DynamoDB",
             "aws.operation": "GetItem",
             "aws.request_id": "18BO1FEPJSSAOGNJEDPTPCMIU7VV4KQNSO5AEMVJF66Q9ASUAAJG",
             "aws.table_name": "otel-dev-Testing"},
            name="AmazonDynamoDB.getItem",
        )
    )
    assert seg["name"] == "DynamoDB"
    assert seg["namespace"] == "aws"
    assert seg["type"] == "subsegment"
    js = segment_to_json(seg)
    assert "DynamoDB" in js
    assert '"user"' not in js


def test_client_span_with_peer_service():  # segment_test.go:75-93
    seg = _seg(
        _span({"http.method": "POST", "http.host": "dynamodb.us-east-1.amazonaws.com",
               "peer.service": "cats-table", "aws.service": "DynamoDB"})
    )
    assert seg["name"] == "cats-table"


def test_server_span_internal_error():  # segment_test.go:95-120
    seg = _seg(
        _span(
            {"http.method": "POST",
             "http.url": "https://api.example.org/api/locations",
             "http.target": "/api/locations", "http.status_code": 500,
             "http.status_text": "java.lang.NullPointerException",
             "http.user_agent": "PostmanRuntime/7.21.0",
             "enduser.id": "go.tester@example.com"},
            kind="server", status="error",
            message="java.lang.NullPointerException",
        )
    )
    assert seg["cause"] is not None
    assert seg["name"] == "signup_aggregator"
    assert seg["fault"] is True
    assert seg["user"] == "go.tester@example.com"


def test_server_span_throttle():  # segment_test.go:122-149
    seg = _seg(
        _span(
            {"http.method": "POST",
             "http.url": "https://api.example.org/api/locations",
             "http.status_code": 429,
             "http.status_text": "java.lang.NullPointerException"},
            kind="server", status="error",
            message="java.lang.NullPointerException",
        )
    )
    assert seg["fault"] is False
    assert seg["error"] is True
    assert seg["throttle"] is True


def test_span_no_parent_id():  # segment_test.go:151-176
    seg = _seg(_span({}, kind="producer", parent=None))
    assert seg["parent_id"] is None
    assert seg["type"] is None  # not a subsegment without a parent


def test_client_span_with_db():  # segment_test.go:192-233
    seg = _seg(
        _span(
            {"db.system": "mysql", "db.name": "customers",
             "db.statement": "call update_user_preference( ?, ?, ? )",
             "db.user": "userprefsvc",
             "db.connection_string": "mysql://db.dev.example.com:3306",
             "net.peer.name": "db.dev.example.com", "net.peer.port": "3306",
             "enterprise.app.id": "25F2E73B-4769-4C79-9DF3-7EBE85D571EA"},
            name="call update_user_preference( ?, ?, ? )",
        )
    )
    assert seg["sql"] is not None
    assert seg["sql"]["url"] == "mysql://db.dev.example.com:3306/customers"
    assert seg["service"] == {"version": "semver:1.1.4"}
    assert seg["aws"] is not None
    assert seg["annotations"] is None
    assert (
        seg["metadata"]["default"]["enterprise.app.id"]
        == "25F2E73B-4769-4C79-9DF3-7EBE85D571EA"
    )
    assert seg["cause"] is None
    assert seg["http"] is None
    assert seg["name"] == "customers@db.dev.example.com"
    assert seg["fault"] is False and seg["error"] is False
    assert seg["namespace"] == "remote"


def test_client_span_http_host_name():  # segment_test.go:235-253
    seg = _seg(
        _span({"http.method": "GET", "http.scheme": "https",
               "net.peer.ip": "2607:f8b0:4000:80c::2004", "net.peer.port": "9443",
               "http.target": "/", "http.host": "foo.com",
               "net.peer.name": "bar.com"})
    )
    assert seg["name"] == "foo.com"


def test_span_invalid_trace_id():  # segment_test.go:294-313
    span = _span({"http.method": "GET"})
    span["trace_id"] = "11" * 16  # epoch 0x11111111, out of window
    with pytest.raises(ValueError):
        make_segment(span, _default_resource(), epoch_now=EPOCH_NOW)


def test_attributes_default_not_indexed():  # segment_test.go:366-391
    seg = _seg(
        _span({"attr1@1": "val1", "attr2@2": "val2"}, kind="server",
              status="error", message="OK")
    )
    assert seg["annotations"] is None
    md = seg["metadata"]["default"]
    assert md["attr1@1"] == "val1"
    assert md["attr2@2"] == "val2"
    assert md["otel.resource.string.key"] == "string"
    assert md["otel.resource.int.key"] == 10
    assert md["otel.resource.double.key"] == 5.0
    assert md["otel.resource.bool.key"] is True
    assert md["otel.resource.map.key"] == {"key1": 1, "key2": "value"}
    assert md["otel.resource.array.key"] == ["foo", "bar"]


def test_resource_not_stored_if_subsegment():  # segment_test.go:393-414
    seg = _seg(
        _span({"attr1@1": "val1", "attr2@2": "val2"}, kind="client",
              status="error", message="ERROR")
    )
    md = seg["metadata"]["default"]
    assert md["attr1@1"] == "val1"
    assert "otel.resource.string.key" not in md


def test_attributes_partly_indexed():  # segment_test.go:416-431
    seg = _seg(
        _span({"attr1@1": "val1", "attr2@2": "val2"}, kind="server",
              status="error", message="OK"),
        indexed=["attr1@1", "not_exist"],
    )
    assert seg["annotations"] == {"attr1_1": "val1"}
    assert seg["metadata"]["default"]["attr2@2"] == "val2"


def test_attributes_all_indexed():  # segment_test.go:433-447
    seg = _seg(
        _span({"attr1@1": "val1", "attr2@2": "val2"}, kind="server"),
        indexed=["attr1@1", "not_exist"], index_all=True,
    )
    assert seg["annotations"]["attr1_1"] == "val1"
    assert seg["annotations"]["attr2_2"] == "val2"


def test_resource_attributes_can_be_indexed():  # segment_test.go:449-479
    seg = _seg(
        _span({}, kind="server", status="error", message="OK"),
        indexed=[
            "otel.resource.string.key", "otel.resource.int.key",
            "otel.resource.double.key", "otel.resource.bool.key",
            "otel.resource.map.key", "otel.resource.array.key",
        ],
    )
    a = seg["annotations"]
    assert len(a) == 4
    assert a["otel_resource_string_key"] == "string"
    assert a["otel_resource_int_key"] == 10
    assert a["otel_resource_double_key"] == 5.0
    assert a["otel_resource_bool_key"] is True
    md = seg["metadata"]["default"]
    assert md["otel.resource.map.key"] == {"key1": 1, "key2": "value"}
    assert md["otel.resource.array.key"] == ["foo", "bar"]


def test_resource_not_indexed_if_subsegment():  # segment_test.go:481-500
    seg = _seg(
        _span({}, kind="client", status="error", message="OK"),
        indexed=["otel.resource.string.key"],
    )
    assert seg["annotations"] is None
    assert seg["metadata"] is None


# ---------------------------------------------------------------- origin


def test_origins():  # segment_test.go:502-650
    assert determine_aws_origin(
        {"cloud.provider": "gcp", "host.id": "instance-123"}
    ) == ""
    assert determine_aws_origin(
        {"cloud.provider": "aws", "cloud.platform": "EC2", "host.id": "i-1"}
    ) == ORIGIN_EC2
    assert determine_aws_origin(
        {"cloud.provider": "aws", "cloud.platform": "ECS",
         "container.name": "c1"}
    ) == ORIGIN_ECS
    assert determine_aws_origin(
        {"cloud.provider": "aws", "cloud.platform": "ECS",
         "aws.ecs.launchtype": "ec2"}
    ) == ORIGIN_ECS_EC2
    assert determine_aws_origin(
        {"cloud.provider": "aws", "cloud.platform": "ECS",
         "aws.ecs.launchtype": "fargate"}
    ) == ORIGIN_ECS_FARGATE
    assert determine_aws_origin(
        {"cloud.provider": "aws", "cloud.platform": "ElasticBeanstalk"}
    ) == ORIGIN_EB
    assert determine_aws_origin(
        {"cloud.provider": "aws", "cloud.platform": "EKS"}
    ) == ORIGIN_EKS
    # fallback chain EKS > EB > ECS > EC2 (no cloud.platform)
    assert determine_aws_origin(
        {"cloud.provider": "aws", "host.id": "i", "container.name": "c",
         "service.instance.id": "s"}
    ) == ORIGIN_EB
    assert determine_aws_origin({"cloud.provider": "aws"}) == ""
    # infra service preferred over the fallback chain
    assert determine_aws_origin(
        {"cloud.provider": "aws", "cloud.platform": "EC2",
         "k8s.cluster.name": "c", "container.name": "c",
         "service.instance.id": "s", "host.id": "i"}
    ) == ORIGIN_EC2
    assert determine_aws_origin({}) == ""


# ---------------------------------------------------------------- makeAws


def test_aws_from_ec2_resource():  # aws_test.go:28-60
    _, aws = make_aws({}, {
        "cloud.provider": "aws", "cloud.account.id": "123456789",
        "cloud.availability_zone": "us-east-1c", "host.id": "i-00f7c0bcb26da2a99",
        "host.type": "m5.xlarge", "host.image.id": "ami-0123456789",
    })
    assert aws["ec2"] == {
        "instance_id": "i-00f7c0bcb26da2a99", "availability_zone": "us-east-1c",
        "instance_size": "m5.xlarge", "ami_id": "ami-0123456789",
    }
    assert aws["account_id"] == "123456789"
    assert aws["ecs"] is None and aws["elastic_beanstalk"] is None


def test_aws_from_ecs_resource():  # aws_test.go:62-116
    _, aws = make_aws({}, {
        "cloud.provider": "aws", "cloud.account.id": "123456789",
        "cloud.availability_zone": "us-east-1c",
        "container.name": "signup_aggregator", "container.id": "0123456789A",
        "aws.ecs.cluster.arn": "arn:aws:ecs:us-west-2:123456789123:cluster/my-cluster",
        "aws.ecs.container.arn": "arn:aws:ecs:us-west-2:123456789123:container-instance/123",
        "aws.ecs.task.arn": "arn:aws:ecs:us-west-2:123456789123:task/123",
        "aws.ecs.task.family": "family", "aws.ecs.launchtype": "ec2",
    })
    assert aws["ecs"]["container"] == "signup_aggregator"
    assert aws["ecs"]["container_id"] == "0123456789A"
    assert aws["ecs"]["launch_type"] == "ec2"


def test_aws_from_beanstalk_resource():  # aws_test.go:118-146
    _, aws = make_aws({}, {
        "cloud.provider": "aws", "cloud.account.id": "123456789",
        "service.namespace": "production", "service.instance.id": "32",
        "service.version": "v1",
    })
    assert aws["elastic_beanstalk"] == {
        "environment_name": "production", "deployment_id": 32,
        "version_label": "v1",
    }


def test_aws_from_eks_resource():  # aws_test.go:148-184
    _, aws = make_aws({}, {
        "cloud.provider": "aws", "k8s.cluster.name": "production",
        "k8s.pod.name": "signup_aggregator-x82ufje83", "container.id": "0123456789A",
        "container.name": "signup_aggregator",
    })
    assert aws["eks"] == {
        "cluster_name": "production", "pod": "signup_aggregator-x82ufje83",
        "container_id": "0123456789A",
    }


def test_aws_span_attributes_and_alternates():  # aws_test.go:186-293
    filtered, aws = make_aws(
        {"aws.operation": "SendMessage",
         "aws.queue_url": "https://sqs.use1.amazonaws.com/123456789/queue",
         "employee.id": "XB477"}, {},
    )
    assert aws["operation"] == "SendMessage"
    assert aws["queue_url"] == "https://sqs.use1.amazonaws.com/123456789/queue"
    assert filtered == {"employee.id": "XB477"}
    _, aws2 = make_aws(
        {"aws.queue.url": "https://sqs.use1.amazonaws.com/123456789/queue",
         "aws.table.name": "t1", "aws.requestId": "x-123"}, {},
    )
    assert aws2["queue_url"].endswith("/queue")
    assert aws2["table_name"] == "t1"
    assert aws2["request_id"] == "x-123"


def test_aws_sdk_metadata():  # aws_test.go:295-355
    _, aws = make_aws({}, {
        "telemetry.sdk.name": "opentelemetry", "telemetry.sdk.language": "java",
        "telemetry.sdk.version": "1.2.3",
    })
    assert aws["xray"] == {
        "sdk": "opentelemetry for java", "sdk_version": "1.2.3",
        "auto_instrumentation": False,
    }
    _, aws2 = make_aws({}, {
        "telemetry.sdk.name": "opentelemetry", "telemetry.sdk.language": "java",
        "telemetry.sdk.version": "1.2.3", "telemetry.auto.version": "1.2.1",
    })
    assert aws2["xray"]["auto_instrumentation"] is True


def test_aws_log_groups():  # aws_test.go:357-416
    _, aws = make_aws({}, {"aws.log.group.names": ["group1", "group2"]})
    assert aws["cloudwatch_logs"] == [
        {"log_group": "group1"}, {"log_group": "group2"},
    ]
    arn = "arn:aws:logs:us-east-1:123456789123:log-group:group1"
    _, aws2 = make_aws({}, {"aws.log.group.arns": [arn]})
    assert aws2["cloudwatch_logs"] == [{"log_group": "group1", "arn": arn}]


def test_non_aws_cloud_returns_none():  # aws.go:164-166
    filtered, aws = make_aws({"k": "v"}, {"cloud.provider": "gcp"})
    assert aws is None
    assert filtered == {"k": "v"}


# ----------------------------------------------------------------- SQL


def test_make_sql():  # sql_test.go:25-78
    filtered, sql = make_sql({
        "db.connection_string": "jdbc:postgresql://ramjet.dev.example.com:5432",
        "db.system": "postgresql", "db.name": "customers",
        "db.statement": "SELECT * FROM user WHERE user_id = ?",
        "db.user": "userprefsvc",
    })
    assert sql["url"] == "jdbc:postgresql://ramjet.dev.example.com:5432/customers"
    assert sql["database_type"] == "postgresql"
    assert sql["sanitized_query"] == "SELECT * FROM user WHERE user_id = ?"
    assert filtered == {}
    attrs = {"db.system": "redis", "db.name": "0"}
    filtered2, sql2 = make_sql(attrs)
    assert sql2 is None
    assert filtered2 == attrs  # untouched for non-SQL
    _, sql3 = make_sql({"db.system": "mysql", "db.name": "customers"})
    assert sql3["url"] == "localhost/customers"


# ------------------------------------------------- stage + round-trip


def test_encoder_stage_and_roundtrip():
    rows = []
    for i in range(8):
        err = i % 3 == 0
        rows.append(
            {
                "trace_id": _tid(i + 1),
                "span_id": f"{i + 1:016x}",
                "parent_span_id": None if i % 2 == 0 else "cc" * 8,
                "name": f"op-{i}",
                "kind": "server" if i % 2 == 0 else "client",
                "start_ns": (EPOCH_NOW - 60) * 1_000_000_000,
                "end_ns": (EPOCH_NOW - 60 + i) * 1_000_000_000,
                "status_code": "error" if err else "unset",
                "status_message": "boom" if err else None,
                "attrs": json.dumps(
                    {"http.method": "GET", "http.status_code": 500 if err else 200,
                     "enduser.id": f"user-{i}"}
                ),
                "events": None,
                "resource_attrs": json.dumps({"service.name": "svc"}),
            }
        )
    batch = pa.table(
        {k: [r[k] for r in rows] for k in rows[0]}
    )
    enc = XRaySegmentEncoder(epoch_now=EPOCH_NOW)
    out = enc(batch)
    assert len(out) == 8
    assert out["_batch_dropped"][0].as_py() == 0
    # subsegments: client spans with a parent
    types = out["seg_type"].to_pylist()
    kinds = [r["kind"] for r in rows]
    for t, k, r in zip(types, kinds, rows):
        assert (t == "subsegment") == (k != "server" and r["parent_span_id"] is not None)
    # round-trip through the receiver-side decoder
    dec = XRaySegmentDecoder()
    spans = dec(pa.table({"raw": out["segment_json"]}))
    assert len(spans) == 8
    got = {
        s["span_id"]: s for s in spans.to_pylist()
    }
    for r in rows:
        s = got[r["span_id"]]
        assert s["trace_id"] == r["trace_id"]
        assert s["start_ns"] == r["start_ns"]
        assert s["end_ns"] == r["end_ns"]
        attrs = json.loads(s["attrs"])
        assert attrs["enduser.id"] == json.loads(r["attrs"])["enduser.id"]
        if r["status_code"] == "error":
            assert s["status_code"] == "error"

    # expired trace ids are dropped and counted
    bad = batch.set_column(
        0, "trace_id", pa.array(["00000001" + "0" * 24] * 8)
    )
    out_bad = enc(bad)
    assert len(out_bad) == 0
