"""elasticexporter APM translation, vectorized.

Re-expresses `exporter/elasticexporter/internal/translator/elastic/`
as map_batches stages over span rows → Elastic APM transaction/span
records, plus the Java exception-stacktrace parser and the resource
metadata encoder. Semantics (file:line under /root/reference):

Span routing (traces.go:38-95): a span whose parent id is empty
(root) OR whose kind is SERVER becomes a *transaction*; every other
span becomes a *span* record. Duration is (end-start) in float ms.

Transactions (traces.go:97-219):
* ``outcome`` from the status code: OK → "success", ERROR →
  "failure", unset → "" (:621-630); ``result`` "OK"/"Error" for set
  codes (:186-193).
* type "request" iff any Request-building http.* attribute is present
  (method / valid url / valid target / host / scheme / flavor /
  server_name / client_ip / user_agent); a status code alone builds
  only the Response, NOT a request (:133-134,512-515,195-197).
* request URL assembly: scheme failsafe "http" when the attributes
  never set one (:198-203); empty hostname falls back to
  ``http.server_name`` then ``net.host.name`` (:137-138,204-206);
  empty port falls back to ``net.host.port`` when > 0 (:207-209).
* socket remote address: ``net.peer.ip`` (+ ":port" when
  ``net.peer.port`` > 0), only for requests (:210-216).
* an INVALID http.url/http.target is recorded as a label instead
  (:115-128).

Spans (traces.go:221-358):
* span-side mapped attributes are ONLY http.url/target/host/scheme/
  status_code, net.peer.name/ip/port and db.* — e.g. http.method on a
  non-server span becomes a label (:229-283).
* http.url/http.target parse into the span's HTTP context; scheme
  failsafe "http" (:296-301). Destination address/port: the URL's
  host/port when present (default port by scheme when absent,
  :303-310); else ``net.peer.name`` → ``net.peer.ip`` with the URL
  host back-filled from them (:311-324).
* destination.service for external HTTP (:326-337): name =
  scheme://host with an explicit default port DROPPED; resource =
  host:port with the default port APPENDED when the URL carried no
  explicit port.
* db.* attrs → type "db" (overriding "external" — the db check runs
  last), subtype db.system, destination service name = resource =
  subtype (:340-348); plain spans are type "app" (:291).
* every unmapped attribute becomes a label with '.'/'*'/'"' in the
  key replaced by '_' (utils.go:49-51) and string values truncated
  to 1024 runes (utils.go:53-63).

Exceptions (exceptions.go:34-205): span events named "exception"
with a message or type become error records; a Java-language
stacktrace is parsed into frames — "at mod/class.method(File:line)"
frames (class-loader prefixes dropped), "Caused by:" chains onto the
cause list sharing the enclosing Handled flag, "Suppressed:" blocks
are parsed but ignored, and "... N more" copies the last N frames of
the ENCLOSING exception's stacktrace; any parse failure throws the
whole stacktrace back as a plain attribute (:56-64).

Metadata (metadata.go:28-111): service.name cleaned to
[a-zA-Z0-9 _-] (else '_'), defaults service.name="unknown",
agent.name="otlp", agent.version="unknown"; the SDK language
suffixes the agent name ("otlp/java"); k8s/host fields map to
system.*; everything else becomes a cleaned label.
"""

from __future__ import annotations

import re
from typing import Mapping, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

_TRUNC = 1024  # utils.go:53-63 (runes)

# scheme://host(:port)/path?query#fragment — the well-formed subset of
# Go's url.Parse the batch engine accepts; anything else follows the
# reference's invalid-URL fallback and is recorded as a label
# (traces.go:115-128). A value with no "://" is treated as relative
# (path-only), like http.target.
_ABS_URL_RE = re.compile(
    r"^(?P<scheme>[a-zA-Z][a-zA-Z0-9+.-]*)://"
    r"(?P<host>\[[^\]]*\]|[^/?#:]*)(?::(?P<port>\d+))?"
    r"(?P<path>/[^?#]*)?(?:\?(?P<query>[^#]*))?(?:#(?P<frag>.*))?$"
)
# Go's url.Parse rejects a relative URL whose FIRST segment contains a
# colon ("0.0.0.0:8081") — that value falls back to a label
# (traces.go:115-128, traces_test.go:257-266,431-440)
_REL_INVALID_RE = re.compile(r"^[^/?#]*:")
_REL_URL_RE = re.compile(
    r"^(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?(?:#(?P<frag>.*))?$"
)

_LABEL_KEY_RE = re.compile(r'[.*"]')  # utils.go:28,49-51

# attributes consumed by the transaction path (traces.go:109-182)
_MAPPED_TX = {
    "http.method", "http.url", "http.target", "http.host", "http.scheme",
    "http.status_code", "http.flavor", "http.server_name",
    "http.client_ip", "http.user_agent", "http.remote_addr",
    "net.peer.ip", "net.peer.port", "net.host.name", "net.host.port",
}
# attributes consumed by the span path (traces.go:229-283)
_MAPPED_SPAN = {
    "http.url", "http.target", "http.host", "http.scheme",
    "http.status_code", "net.peer.name", "net.peer.ip", "net.peer.port",
    "db.system", "db.name", "db.statement", "db.user",
}
# Request-model builders → transaction type "request" (:195-197)
_REQUEST_ATTRS = [
    "http.method", "http.host", "http.scheme", "http.flavor",
    "http.server_name", "http.client_ip", "http.user_agent",
]


def clean_label_key(k: str) -> str:
    return _LABEL_KEY_RE.sub("_", k[:_TRUNC])


def clean_service_name(name: str) -> str:
    # utils.go:45-47
    return re.sub(r"[^a-zA-Z0-9 _-]", "_", name[:_TRUNC])


def scheme_default_port(scheme: str) -> int:
    return {"http": 80, "https": 443}.get(scheme, 0)  # traces.go:611-619


def _opt(df: pd.DataFrame, col: str, default=None) -> pd.Series:
    if col in df.columns:
        return df[col].reset_index(drop=True)
    return pd.Series([default] * len(df), dtype=object)


def _num(df: pd.DataFrame, col: str) -> pd.Series:
    if col in df.columns:
        return (
            pd.to_numeric(df[col], errors="coerce")
            .fillna(0)
            .astype(np.int64)
            .reset_index(drop=True)
        )
    return pd.Series(np.zeros(len(df), np.int64))


def _bracket(host: pd.Series) -> pd.Series:
    """net.JoinHostPort bracketing: hosts containing ':' (IPv6) are
    wrapped in [] wherever they join a URL host or host:port pair."""
    h = host.fillna("").astype(str)
    return pd.Series(
        np.where(h.str.contains(":", regex=False), "[" + h + "]", h),
        dtype=object,
    )


class ElasticSpanEncoder:
    """Callable map_batches stage: span rows → APM record rows.

    Output: one row per input span with ``record`` ("transaction" |
    "span"), type/subtype, outcome/result, the assembled ``url_full``
    (transactions) / ``http_url`` + destination fields (spans), and
    ``labels`` (canonical "k=v;..." render of the attributes the
    row's record type does NOT map — including an invalid http.url).
    ``attr_cols`` lists the span-attribute columns; NULL = absent."""

    def __init__(self, attr_cols: Sequence[str] = ()):
        self.attr_cols = list(attr_cols)

    def __call__(self, t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        n = len(df)

        pid = _opt(df, "parent_span_id").fillna("").astype(str).str.lower()
        root = ~(
            pid.str.fullmatch(r"[0-9a-f]{16}").fillna(False) & (pid != "0" * 16)
        )
        kind = _opt(df, "kind").fillna("").str.lower()
        is_tx = (root | (kind == "server")).to_numpy()

        start_ns = _num(df, "start_ns")
        end_ns = _num(df, "end_ns")
        dur_ms = (end_ns - start_ns).to_numpy() / 1e6

        code = _num(df, "status_code").to_numpy()
        outcome = np.select(
            [code == 1, code == 2], ["success", "failure"], default=""
        )
        result = np.where(
            is_tx, np.select([code == 1, code == 2], ["OK", "Error"], default=""), ""
        )

        # ---- parse http.url then http.target (vectorized) ----
        url_raw = _opt(df, "http.url").fillna("").astype(str)
        target_raw = _opt(df, "http.target").fillna("").astype(str)
        abs_parts = url_raw.str.extract(_ABS_URL_RE)
        url_is_abs = ~abs_parts["scheme"].isna()
        url_invalid = (url_raw != "") & ~url_is_abs & url_raw.str.match(_REL_INVALID_RE)
        target_invalid = (target_raw != "") & target_raw.str.match(_REL_INVALID_RE)
        rel_src = url_raw.where((url_raw != "") & ~url_is_abs & ~url_invalid, target_raw)
        rel_src = rel_src.where(~target_invalid | (url_raw != ""), "")
        rel_parts = rel_src.str.extract(_REL_URL_RE)
        has_url_attr = ((url_raw != "") & ~url_invalid) | (
            (target_raw != "") & ~target_invalid
        )

        u_scheme = abs_parts["scheme"].fillna("")
        u_host_raw = abs_parts["host"].fillna("")
        u_host = u_host_raw.str.strip("[]")  # Hostname() unbrackets
        u_port = abs_parts["port"].fillna("")
        u_path = abs_parts["path"].fillna("")
        u_path = u_path.where(url_is_abs, rel_parts["path"].fillna(""))
        u_query = abs_parts["query"].fillna("")
        u_query = u_query.where(url_is_abs, rel_parts["query"].fillna(""))

        sch_attr = _opt(df, "http.scheme").fillna("").astype(str)
        scheme = u_scheme.where(u_scheme != "", sch_attr)
        hh = _opt(df, "http.host").fillna("").astype(str)
        hh_port = hh.str.extract(r":(\d+)$")[0].fillna("")
        hh_host = hh.str.replace(r":\d+$", "", regex=True).str.strip("[]")
        host = u_host.where(u_host != "", hh_host)
        port = u_port.where(u_port != "", hh_port)

        method = _opt(df, "http.method")
        status = _num(df, "http.status_code").to_numpy()

        peer_name = _opt(df, "net.peer.name").fillna("").astype(str)
        peer_ip = _opt(df, "net.peer.ip").fillna("").astype(str)
        peer_port = _num(df, "net.peer.port").to_numpy()
        host_name = _opt(df, "net.host.name").fillna("").astype(str)
        host_port = _num(df, "net.host.port").to_numpy()
        server_name = _opt(df, "http.server_name").fillna("").astype(str)

        # http.remote_addr (non-standard): semantically net.peer.ip+port,
        # standard attributes take precedence (traces.go:143-159)
        ra = _opt(df, "http.remote_addr").fillna("").astype(str)
        ra_port = ra.str.extract(r":(\d+)$")[0].fillna("")
        ra_ip = ra.str.replace(r":\d+$", "", regex=True).str.strip("[]")
        ra_is_ip = ra_ip.str.fullmatch(
            r"(\d{1,3}\.){3}\d{1,3}|[0-9a-fA-F:]*:[0-9a-fA-F:]*"
        ).fillna(False)
        eff_peer_ip = peer_ip.where(
            (peer_ip != "") | ~ra_is_ip, ra_ip
        )
        eff_peer_port = np.where(
            (peer_port > 0) | ~ra_is_ip.to_numpy(),
            peer_port,
            pd.to_numeric(ra_port, errors="coerce").fillna(0).astype(np.int64),
        )

        # ---- transaction side (traces.go:97-219) ----
        has_request = has_url_attr.to_numpy().copy()
        for c in _REQUEST_ATTRS:
            v = _opt(df, c)
            has_request |= (v.notna() & (v.astype(str) != "")).to_numpy()
        tx_type = np.where(has_request, "request", "unknown")

        tx_scheme = scheme.where(scheme != "", "http")
        tx_hostname = host.where(host != "", server_name)
        tx_hostname = tx_hostname.where(tx_hostname != "", host_name)
        tx_port = port.where(
            (port != "") | (host_port <= 0), pd.Series(host_port).astype(str)
        )
        url_full = (
            tx_scheme
            + "://"
            + _bracket(tx_hostname)
            + np.where((tx_port != "").to_numpy(), ":" + tx_port, "")
            + u_path
            + np.where((u_query != "").to_numpy(), "?" + u_query, "")
        )
        remote = eff_peer_ip + np.where(
            (eff_peer_ip != "").to_numpy() & (eff_peer_port > 0),
            ":" + pd.Series(eff_peer_port).astype(str),
            "",
        )

        # ---- span side (traces.go:221-358) ----
        db_system = _opt(df, "db.system")
        has_db = db_system.notna().to_numpy()
        # http.URL context exists when url/target/scheme/host was set
        has_urlctx = (has_url_attr | (sch_attr != "") | (hh != "")).to_numpy()
        # model.HTTP exists when URL context or a status code was set
        has_http = has_urlctx | (status > 0)

        sp_scheme = scheme.where(scheme != "", "http")
        default_port = sp_scheme.map(scheme_default_port).astype(np.int64).to_numpy()

        url_has_host = (host != "").to_numpy()
        url_port_num = (
            pd.to_numeric(port, errors="coerce").fillna(0).astype(np.int64).to_numpy()
        )

        # span-side fallback: net.peer.name preferred over net.peer.ip
        # (traces.go:285-289); NOTE span side uses the raw net.peer.*,
        # not http.remote_addr (transaction-only)
        fallback_addr = peer_name.where(peer_name != "", peer_ip)
        has_fallback = (fallback_addr != "").to_numpy()

        dest_addr = pd.Series(np.where(url_has_host, host, fallback_addr), dtype=object)
        dest_port = np.where(
            url_has_host,
            np.where(url_port_num > 0, url_port_num, default_port),
            np.where(
                peer_port > 0,
                peer_port,
                # URL host back-filled from peer → default port applies
                np.where(has_urlctx & has_fallback, default_port, 0),
            ),
        )

        # effective URL host after backfill: JoinHostPort semantics,
        # keeping explicit ports and bracketing IPv6
        eff_host = pd.Series(
            np.where(
                url_has_host,
                _bracket(host) + np.where((port != "").to_numpy(), ":" + port, ""),
                _bracket(fallback_addr)
                + np.where(
                    has_fallback & (peer_port > 0),
                    ":" + pd.Series(peer_port).astype(str),
                    "",
                ),
            ),
            dtype=object,
        )
        explicit_port = np.where(url_has_host, (port != "").to_numpy(), peer_port > 0)
        is_default = (dest_port == default_port) & (dest_port != 0)
        resource = pd.Series(
            np.where(
                is_default & ~explicit_port,
                eff_host.fillna("").astype(str) + ":" + pd.Series(dest_port).astype(str),
                eff_host,
            ),
            dtype=object,
        )
        name_host = pd.Series(
            np.where(
                is_default & explicit_port,
                _bracket(pd.Series(dest_addr, dtype=object)),
                eff_host,
            ),
            dtype=object,
        )
        svc_url = sp_scheme + "://" + name_host
        sp_url = (
            sp_scheme
            + "://"
            + eff_host.fillna("").astype(str)
            + u_path
            + np.where((u_query != "").to_numpy(), "?" + u_query, "")
        )

        has_dest_svc = has_urlctx & (eff_host.fillna("") != "").to_numpy()
        # the db check runs AFTER the http check, so db wins (:340-348)
        sp_type = np.select([has_db, has_http], ["db", "external"], default="app")
        sp_subtype = np.select(
            [has_db, has_http], [db_system.fillna(""), "http"], default=""
        )
        dest_svc_name = pd.Series(
            np.select(
                [has_db, has_dest_svc], [db_system.fillna(""), svc_url], default=""
            ),
            dtype=object,
        )
        dest_svc_resource = pd.Series(
            np.select(
                [has_db, has_dest_svc],
                [db_system.fillna(""), resource.fillna("")],
                default="",
            ),
            dtype=object,
        )

        # ---- labels: per-record-type unmapped attrs, cleaned keys ----
        labels = pd.Series([""] * n)

        def _append(frag: pd.Series):
            nonlocal labels
            sep = np.where((labels != "") & (frag != ""), ";", "")
            labels = labels + pd.Series(sep) + frag

        # invalid http.url/http.target recorded as a label on BOTH
        # record types (traces.go:115-128)
        bad = url_raw.where(url_invalid, target_raw.where(target_invalid, None))
        bad_key = pd.Series(
            np.where(url_invalid.to_numpy(), "http_url", "http_target"),
            dtype=object,
        )
        _append(
            pd.Series(
                np.where(
                    (url_invalid | target_invalid).to_numpy(),
                    bad_key + "=" + bad.fillna("").astype(str),
                    "",
                ),
                dtype=object,
            )
        )
        for c in self.attr_cols:
            if c not in df.columns or c in ("http.url", "http.target"):
                continue
            v = df[c].reset_index(drop=True)
            present = v.notna().to_numpy()
            if c in _MAPPED_TX and c in _MAPPED_SPAN:
                continue
            elif c in _MAPPED_TX:
                present = present & ~is_tx
            elif c in _MAPPED_SPAN:
                present = present & is_tx
            key = clean_label_key(c)
            frag = pd.Series(
                np.where(
                    present,
                    key + "=" + v.fillna("").astype(str).str.slice(0, _TRUNC),
                    "",
                ),
                dtype=object,
            )
            _append(frag)

        name = _opt(df, "name").fillna("").astype(str).str.slice(0, _TRUNC)
        return pa.table(
            {
                "record": pa.array(np.where(is_tx, "transaction", "span"), pa.string()),
                "name": pa.array(name.to_numpy(dtype=object), pa.string()),
                "duration_ms": pa.array(dur_ms, pa.float64()),
                "type": pa.array(np.where(is_tx, tx_type, sp_type), pa.string()),
                "subtype": pa.array(np.where(is_tx, "", sp_subtype), pa.string()),
                "outcome": pa.array(outcome, pa.string()),
                "result": pa.array(result, pa.string()),
                "url_full": pa.array(
                    np.where(is_tx & has_request, url_full, ""), pa.string()
                ),
                "remote_addr": pa.array(
                    np.where(is_tx & has_request, remote, ""), pa.string()
                ),
                "http_url": pa.array(
                    np.where(
                        ~is_tx & has_urlctx & (eff_host.fillna("") != "").to_numpy(),
                        sp_url,
                        "",
                    ),
                    pa.string(),
                ),
                "http_status": pa.array(np.where(~is_tx, status, 0), pa.int64()),
                "dest_address": pa.array(
                    np.where(~is_tx, dest_addr.fillna(""), ""), pa.string()
                ),
                "dest_port": pa.array(np.where(~is_tx, dest_port, 0), pa.int64()),
                "dest_service_name": pa.array(
                    np.where(~is_tx, dest_svc_name.fillna(""), ""), pa.string()
                ),
                "dest_service_resource": pa.array(
                    np.where(~is_tx, dest_svc_resource.fillna(""), ""), pa.string()
                ),
                "labels": pa.array(labels.to_numpy(dtype=object), pa.string()),
            }
        )


_JAVA_AT_RE = re.compile(r"at (.*)\(([^:]*)(?::([0-9]+))?\)")  # exceptions.go:30
_JAVA_MORE_RE = re.compile(r"\.\.\. ([0-9]+) more")  # exceptions.go:31


def _parse_java_frame(line: str) -> dict:
    m = _JAVA_AT_RE.search(line)
    if m is None:
        raise ValueError(f"failed to parse stacktrace line {line!r}")
    module = ""
    function = m.group(1)
    if "/" in function:
        # class_loader/module/class.method or module/class.method
        # (exceptions.go:169-179)
        module, function = function.split("/", 1)
        if "/" in function:
            module, function = function.split("/", 1)
    classname = ""
    dot = function.rfind(".")
    if dot > 0:
        classname, function = function[:dot], function[dot + 1 :]
    line_no = int(m.group(3)) if m.group(3) else 0
    return {
        "module": module,
        "classname": classname,
        "function": function,
        "file": m.group(2),
        "line": line_no,
    }


def parse_java_stacktrace(s: str, handled: bool = True) -> dict:
    """Java stacktrace text → {message, handled, frames, cause}
    (exceptions.go:82-162). Raises ValueError on any unparseable line;
    the caller then falls back to a plain stacktrace attribute."""
    out: dict = {"message": None, "handled": handled, "frames": [], "cause": None}
    current = out
    enclosing_of: dict[int, dict | None] = {id(out): None}
    stack: list[tuple[dict, int]] = []
    cur_indent = 0
    first = True
    for raw_line in s.splitlines():
        if first:
            first = False
            continue
        line = raw_line
        indent = 0
        stripped = line.lstrip("\t")
        if stripped != line and stripped:
            indent = len(line) - len(stripped)
            line = stripped
        while indent < cur_indent and stack:
            current, cur_indent = stack.pop()
        if line.startswith("at "):
            current["frames"].append(_parse_java_frame(line))
        elif line.startswith("..."):
            enclosing = enclosing_of.get(id(current))
            if enclosing is None:
                raise ValueError(f"no enclosing exception preceding line {line!r}")
            m = _JAVA_MORE_RE.search(line)
            if m is None:
                raise ValueError(f"failed to parse stacktrace line {line!r}")
            n_more = int(m.group(1))
            if len(enclosing["frames"]) < n_more:
                raise ValueError(
                    f"enclosing exception stacktrace has "
                    f"{len(enclosing['frames'])} frames, cannot satisfy {line!r}"
                )
            current["frames"].extend(enclosing["frames"][-n_more:])
        elif line.startswith("Caused by: "):
            cause = {
                "message": line[len("Caused by: "):],
                "handled": current["handled"],
                "frames": [],
                "cause": None,
            }
            current["cause"] = cause
            enclosing_of[id(cause)] = current
            current = cause
        elif line.startswith("Suppressed: "):
            suppressed = {
                "message": line[len("Suppressed: "):],
                "handled": current["handled"],
                "frames": [],
                "cause": None,
            }
            stack.append((current, cur_indent))
            enclosing_of[id(suppressed)] = current
            current = suppressed
            cur_indent = indent
        else:
            raise ValueError(f"unexpected line {line!r}")
    return out


def exception_events_to_errors(df: pd.DataFrame, language: str = "") -> pd.DataFrame:
    """Span-event rows → APM error rows (exceptions.go:34-72 +
    traces.go:360-412). Input columns: event_name, exc_type,
    exc_message, exc_stacktrace, exc_escaped, trace_id, span_id.
    Events not named 'exception' or with neither type nor message are
    skipped. Exception rows are rare relative to spans; the per-row
    stacktrace walk is the inherent cost, not a hot path."""
    rows = []
    for r in df.itertuples(index=False):
        if getattr(r, "event_name", "") != "exception":
            continue
        msg = getattr(r, "exc_message", "") or ""
        typ = getattr(r, "exc_type", "") or ""
        if msg == "" and typ == "":
            continue
        if msg == "":
            msg = "[EMPTY]"  # exceptions.go:42-44
        escaped = bool(getattr(r, "exc_escaped", False))
        stack = getattr(r, "exc_stacktrace", "") or ""
        n_frames = 0
        n_causes = 0
        stack_attr = ""
        if stack:
            try:
                if language != "java":
                    raise ValueError(f"parsing {language!r} not implemented")
                parsed = parse_java_stacktrace(stack, handled=not escaped)
                node = parsed
                while node is not None:
                    n_frames += len(node["frames"])
                    node = node["cause"]
                    if node is not None:
                        n_causes += 1
            except ValueError:
                n_frames = 0
                n_causes = 0
                stack_attr = stack  # exceptions.go:56-64
        rows.append(
            {
                "message": msg,
                "type": typ,
                "handled": not escaped,
                "trace_id": getattr(r, "trace_id", ""),
                "parent_id": getattr(r, "span_id", ""),
                "n_frames": n_frames,
                "n_causes": n_causes,
                "stacktrace_attr": stack_attr,
            }
        )
    return pd.DataFrame(
        rows,
        columns=[
            "message", "type", "handled", "trace_id", "parent_id",
            "n_frames", "n_causes", "stacktrace_attr",
        ],
    )


def encode_resource_metadata(attrs: Mapping[str, object]) -> dict:
    """Resource attrs → APM metadata dict (metadata.go:28-111)."""
    service: dict = {}
    agent: dict = {"name": "", "version": ""}
    system: dict = {}
    k8s: dict = {}
    labels: dict = {}
    language = ""
    for k, v in attrs.items():
        s = str(v)
        if k == "service.name":
            service["name"] = clean_service_name(s)
        elif k == "service.version":
            service["version"] = s[:_TRUNC]
        elif k == "service.instance.id":
            service["node"] = {"configured_name": s[:_TRUNC]}
        elif k == "deployment.environment":
            service["environment"] = s[:_TRUNC]
        elif k == "telemetry.sdk.name":
            agent["name"] = s[:_TRUNC]
        elif k == "telemetry.sdk.language":
            language = s[:_TRUNC]
            service["language"] = {"name": language}
        elif k == "telemetry.sdk.version":
            agent["version"] = s[:_TRUNC]
        elif k == "k8s.namespace.name":
            k8s["namespace"] = s[:_TRUNC]
        elif k == "k8s.pod.name":
            k8s.setdefault("pod", {})["name"] = s[:_TRUNC]
        elif k == "k8s.pod.uid":
            k8s.setdefault("pod", {})["uid"] = s[:_TRUNC]
        elif k == "host.name":
            system["hostname"] = s[:_TRUNC]
        else:
            labels[clean_label_key(k)] = v
    if not service.get("name"):
        service["name"] = "unknown"  # metadata.go:85-88
    if not agent["name"]:
        agent["name"] = "otlp"
    if not agent["version"]:
        agent["version"] = "unknown"
    if language:
        agent["name"] = f"{agent['name']}/{language}"
    service["agent"] = agent
    if k8s:
        system["kubernetes"] = k8s
    out = {"service": service}
    if system:
        out["system"] = system
    if labels:
        out["labels"] = labels
    return out
