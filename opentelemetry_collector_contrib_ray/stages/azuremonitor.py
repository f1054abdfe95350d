"""azuremonitorexporter span → Application Insights envelope, vectorized.

Re-expresses `exporter/azuremonitorexporter/trace_to_envelope.go` as a
`map_batches` stage. Semantics (file:line under /root/reference):

* kind routing (:53-109): UNSPECIFIED → INTERNAL; Server/Consumer →
  RequestData envelopes; Client/Producer/Internal → RemoteDependency
  (Internal forces Type "InProc").
* span typing by attribute presence, checked in order rpc.system →
  http.method → db.system → messaging.system → faas.trigger
  (:588-620); FaaS spans are unsupported and dropped (:70-73).
* defaults (:158-210): data id = span id hex, name = span name,
  duration = DD.HH:MM:SS.ffffff (time_utils.go:30-47), response/result
  code = str(status code int) with success = code != ERROR.
* HTTP requests (:218-302): response code from http.status_code when
  set (success = 100..399), name = "METHOD route-or-span-name" with
  "/"-prefixed route, url preference scheme+host+target →
  scheme+server_name+host_port+target → scheme+net.host.name+port+
  target → http.url; source = http.client_ip else net.peer.ip.
* HTTP dependencies (:304-388): type HTTP, name = METHOD [+ route],
  data/target preference http.url (target = parsed authority) →
  scheme+http.host+target → scheme+net.peer.name:port+target →
  scheme+net.peer.ip:port+target.
* RPC (:391-441): response/result code from rpc.grpc.status_code else
  "0"; request name/url prefixed with the rpc system; dependency type
  = rpc.system, data = name, target = peer address (name over ip,
  ":port" suffix — :630-643).
* Database (:443-459): type = db.system, data = db.statement else
  db.operation, target = peer address.
* Messaging (:461-491): request source / dependency data =
  messaging.url else peer address; dependency type = messaging.system.
* envelope tags (:75-151): ai.operation.id = trace hex,
  ai.operation.parentId = parent hex, operation name for requests;
  cloud role = service.namespace "." service.name (or just name),
  role instance = service.instance.id; time = RFC3339Nano of start.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np
import pandas as pd
import pyarrow as pa

_REQUEST_ENVELOPE = "Microsoft.ApplicationInsights.Request"
_DEPENDENCY_ENVELOPE = "Microsoft.ApplicationInsights.RemoteDependency"

_ATTRS = [
    "rpc.system",
    "rpc.grpc.status_code",
    "http.method",
    "http.route",
    "http.status_code",
    "http.url",
    "http.scheme",
    "http.host",
    "http.target",
    "http.server_name",
    "http.client_ip",
    "db.system",
    "db.statement",
    "db.operation",
    "messaging.system",
    "messaging.url",
    "faas.trigger",
    "net.peer.name",
    "net.peer.ip",
    "net.peer.port",
    "net.host.port",
    "net.host.name",
]


def format_duration_ns(ns: pd.Series) -> pd.Series:
    """time_utils.go:30-47 — DD.HH:MM:SS.ffffff from nanoseconds."""
    us = (ns // 1000).astype(np.int64)
    day = us // 86_400_000_000
    rem = us - day * 86_400_000_000
    h = rem // 3_600_000_000
    rem -= h * 3_600_000_000
    m = rem // 60_000_000
    rem -= m * 60_000_000
    s_ = rem // 1_000_000
    frac = rem - s_ * 1_000_000
    z2 = lambda x: x.astype(np.int64).astype(str).str.zfill(2)  # noqa: E731
    return z2(day) + "." + z2(h) + ":" + z2(m) + ":" + z2(s_) + "." + frac.astype(np.int64).astype(str).str.zfill(6)


def _rfc3339nano(ns: pd.Series) -> pd.Series:
    dt = pd.to_datetime(ns, unit="ns", utc=True)
    base = dt.dt.strftime("%Y-%m-%dT%H:%M:%S")
    frac = (ns % 1_000_000_000).astype(np.int64)
    fstr = frac.astype(str).str.zfill(9).str.rstrip("0")
    return base + np.where(frac > 0, "." + fstr, "") + "Z"


def _peer_address(df: pd.DataFrame) -> pd.Series:
    """writeFormattedPeerAddressFromNetworkAttributes (:630-643)."""
    name = df["net.peer.name"].fillna("")
    ip = df["net.peer.ip"].fillna("")
    host = name.where(name != "", ip)
    port = pd.to_numeric(df["net.peer.port"], errors="coerce").fillna(0).astype(np.int64)
    return host + np.where(port != 0, ":" + port.astype(str), "")


def _prefix_slash(s: pd.Series) -> pd.Series:
    s = s.fillna("")
    return np.where((s != "") & ~s.str.startswith("/"), "/" + s, s)


class AzureMonitorSpanToEnvelope:
    """Callable map_batches stage: span rows → envelope rows."""

    def __init__(self, resource_attrs: Mapping[str, str] | None = None):
        self.resource_attrs = dict(resource_attrs or {})

    def __call__(self, t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        for c in _ATTRS:
            if c not in df.columns:
                df[c] = None
        n0 = len(df)

        # ---- span typing (:588-620); FaaS dropped (:70-73) ----
        has = {c: df[c].notna() for c in ("rpc.system", "http.method", "db.system", "messaging.system", "faas.trigger")}
        stype = pd.Series(["unknown"] * n0)
        stype = stype.where(~has["faas.trigger"], "faas")
        stype = stype.where(~has["messaging.system"], "messaging")
        stype = stype.where(~has["db.system"], "database")
        stype = stype.where(~has["http.method"], "http")
        stype = stype.where(~has["rpc.system"], "rpc")
        keep = (stype != "faas").to_numpy(dtype=bool)
        df, stype = df[keep].reset_index(drop=True), stype[keep].reset_index(drop=True)

        kind = df.get("kind", pd.Series([None] * len(df))).fillna("unspecified")
        kind = kind.where(kind != "unspecified", "internal")
        is_request = kind.isin(["server", "consumer"])

        code = df.get("status_code", pd.Series([0] * len(df))).fillna(0).astype(np.int64)
        def_code = code.astype(str)
        def_success = code != 2  # != StatusCodeError

        # ---- HTTP shared ----
        http_status = pd.to_numeric(df["http.status_code"], errors="coerce").fillna(0).astype(np.int64)
        http_over = (stype == "http") & (http_status != 0)
        response_code = def_code.where(~http_over, http_status.astype(str))
        success = def_success.where(~http_over, (http_status >= 100) & (http_status <= 399))

        # RPC status override (:433-441)
        grpc = pd.to_numeric(df["rpc.grpc.status_code"], errors="coerce").fillna(0).astype(np.int64)
        rpc_m = stype == "rpc"
        response_code = response_code.where(~rpc_m, np.where(grpc != 0, grpc.astype(str), "0"))

        method = df["http.method"].fillna("")
        route = df["http.route"].fillna("")
        target = _prefix_slash(df["http.target"])
        scheme = df["http.scheme"].fillna("")
        hhost = df["http.host"].fillna("")
        hurl = df["http.url"].fillna("")
        server_name = df["http.server_name"].fillna("")
        host_name = df["net.host.name"].fillna("")
        host_port = pd.to_numeric(df["net.host.port"], errors="coerce").fillna(0).astype(np.int64)
        hp_str = pd.Series(np.where(host_port != 0, host_port.astype(str), ""))
        peer_port = pd.to_numeric(df["net.peer.port"], errors="coerce").fillna(0).astype(np.int64)
        pp_str = pd.Series(np.where(peer_port != 0, peer_port.astype(str), ""))
        peer_name = df["net.peer.name"].fillna("")
        peer_ip = df["net.peer.ip"].fillna("")
        url_host = hurl.str.extract(r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)")[0].fillna("")

        name = df["name"].fillna("")
        # request name: METHOD + (route|span name) (:225-240)
        req_http_name = method + " " + np.where(route != "", _prefix_slash(route), name)
        # dependency name: METHOD [+ " " + route] (:313-325)
        dep_http_name = method + np.where(route != "", " " + route, "")
        rpc_name = df["rpc.system"].fillna("") + " " + name
        data_name = name.copy()
        data_name = data_name.where(stype != "http", np.where(is_request, req_http_name, dep_http_name))
        data_name = data_name.where(~rpc_m, rpc_name)

        # request url chain (:242-290)
        req_url = pd.Series([""] * len(df))
        c4 = hurl != ""
        req_url = req_url.where(~c4, hurl)
        c3 = (scheme != "") & (host_name != "") & (hp_str != "") & (target != "")
        req_url = req_url.where(~c3, scheme + "://" + host_name + ":" + hp_str + target)
        c2 = (scheme != "") & (server_name != "") & (hp_str != "") & (target != "")
        req_url = req_url.where(~c2, scheme + "://" + server_name + ":" + hp_str + target)
        c1 = (scheme != "") & (hhost != "") & (target != "")
        req_url = req_url.where(~c1, scheme + "://" + hhost + target)
        req_url = req_url.where(stype == "http", "")
        req_url = req_url.where(~rpc_m, rpc_name)  # RPC: url = name (:401-404)

        # dependency data/target chain (:327-388)
        dep_data = pd.Series([""] * len(df))
        dep_target = pd.Series([""] * len(df))
        d3 = (scheme != "") & (peer_ip != "") & (pp_str != "") & (target != "")
        dep_data = dep_data.where(~d3, scheme + "://" + peer_ip + ":" + pp_str + target)
        dep_target = dep_target.where(~d3, peer_ip + ":" + pp_str)
        d2 = (scheme != "") & (peer_name != "") & (pp_str != "") & (target != "")
        dep_data = dep_data.where(~d2, scheme + "://" + peer_name + ":" + pp_str + target)
        dep_target = dep_target.where(~d2, peer_name + ":" + pp_str)
        d1 = (scheme != "") & (hhost != "") & (target != "")
        dep_data = dep_data.where(~d1, scheme + "://" + hhost + target)
        dep_target = dep_target.where(~d1, hhost)
        d0 = hurl != ""
        dep_data = dep_data.where(~d0, hurl)
        dep_target = dep_target.where(~d0, url_host)
        dep_data = dep_data.where(stype == "http", "")
        dep_target = dep_target.where(stype == "http", "")

        peer = _peer_address(df)
        db_m = stype == "database"
        db_data = df["db.statement"].fillna("").where(df["db.statement"].notna(), df["db.operation"].fillna(""))
        dep_data = dep_data.where(~db_m, db_data)
        dep_target = dep_target.where(~db_m, peer)
        msg_m = stype == "messaging"
        msg_url = df["messaging.url"].fillna("")
        msg_src = msg_url.where(msg_url != "", peer)
        # dependency: Data = messaging.url as-is; Target falls back to
        # the peer address (:476-491)
        dep_data = dep_data.where(~msg_m, msg_url)
        dep_target = dep_target.where(~msg_m, msg_src)
        dep_data = dep_data.where(~rpc_m, rpc_name)  # data = name (:420-423)
        dep_target = dep_target.where(~rpc_m, peer)

        # dependency type (:304-491 + InProc for internal :96-99)
        dep_type = pd.Series([""] * len(df))
        dep_type = dep_type.where(stype != "http", "HTTP")
        dep_type = dep_type.where(~rpc_m, df["rpc.system"].fillna(""))
        dep_type = dep_type.where(~db_m, df["db.system"].fillna(""))
        dep_type = dep_type.where(~msg_m, df["messaging.system"].fillna(""))
        dep_type = dep_type.where(kind != "internal", "InProc")

        # request source (:292-302, :461-474)
        client_ip = df["http.client_ip"].fillna("")
        req_source = pd.Series([""] * len(df))
        req_source = req_source.where(stype != "http", client_ip.where(client_ip != "", peer_ip))
        req_source = req_source.where(~rpc_m, peer)
        req_source = req_source.where(~msg_m, msg_src)

        start_ns = df["start_ns"].fillna(0).astype(np.int64)
        end_ns = df["end_ns"].fillna(0).astype(np.int64)

        svc = self.resource_attrs.get("service.name")
        ns_ = self.resource_attrs.get("service.namespace")
        cloud_role = (f"{ns_}.{svc}" if ns_ else svc) if svc else None
        role_instance = self.resource_attrs.get("service.instance.id")

        return pa.table(
            {
                "envelope_name": pa.array(
                    np.where(is_request, _REQUEST_ENVELOPE, _DEPENDENCY_ENVELOPE), pa.string()
                ),
                "time": pa.array(_rfc3339nano(start_ns).to_numpy(dtype=object), pa.string()),
                "op_id": pa.array(df["trace_id"].fillna("").to_numpy(dtype=object), pa.string()),
                "op_parent_id": pa.array(df["parent_span_id"].fillna("").to_numpy(dtype=object), pa.string()),
                "op_name": pa.array(
                    pd.Series(np.where(is_request, data_name, None)).to_numpy(dtype=object), pa.string()
                ),
                "cloud_role": pa.array([cloud_role] * len(df), pa.string()),
                "cloud_role_instance": pa.array([role_instance] * len(df), pa.string()),
                "data_id": pa.array(df["span_id"].fillna("").to_numpy(dtype=object), pa.string()),
                "data_name": pa.array(data_name.to_numpy(dtype=object), pa.string()),
                "duration": pa.array(
                    format_duration_ns(end_ns - start_ns).to_numpy(dtype=object), pa.string()
                ),
                "response_code": pa.array(response_code.to_numpy(dtype=object), pa.string()),
                "success": pa.array(success.to_numpy(dtype=bool), pa.bool_()),
                "dep_type": pa.array(
                    pd.Series(np.where(is_request, None, dep_type)).to_numpy(dtype=object), pa.string()
                ),
                "url_or_data": pa.array(
                    pd.Series(np.where(is_request, req_url, dep_data)).to_numpy(dtype=object), pa.string()
                ),
                "target": pa.array(
                    pd.Series(np.where(is_request, "", dep_target)).to_numpy(dtype=object), pa.string()
                ),
                "source": pa.array(
                    pd.Series(np.where(is_request, req_source, "")).to_numpy(dtype=object), pa.string()
                ),
                "span_type": pa.array(stype.to_numpy(dtype=object), pa.string()),
            }
        )
