"""dotnetdiagnosticsreceiver EventPipe codec semantics, ported from
receiver/dotnetdiagnosticsreceiver/dotnet/*_test.go and
metrics/converter.go."""

import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.sources.dotnet import (
    _Cursor,
    encode_counter_stream,
    map_units,
    parse_dotnet_counters,
    parse_ipc,
    parse_nettrace,
    parse_stream,
    raw_metric_rows,
)

MEAN = dict(
    name="cpu-usage", display="CPU Usage", counter_type="Mean",
    mean=12.5, stddev=1.5, count=7, min=1.0, max=99.0, units="%",
)
SUM = dict(
    name="alloc-rate", display="Allocation Rate", counter_type="Sum",
    increment=4096.0, units="B",
)


class TestStreamRoundTrip:
    def test_full_round_trip(self):
        data = encode_counter_stream([MEAN, SUM])
        ms = parse_stream(data)
        assert len(ms) == 2
        m0, m1 = ms
        assert m0["Name"] == "cpu-usage"
        assert m0["CounterType"] == "Mean"
        assert m0["Mean"] == 12.5
        assert m0["StandardDeviation"] == 1.5
        assert m0["Count"] == 7
        assert m0["Min"] == 1.0 and m0["Max"] == 99.0
        assert m0["IntervalSec"] == 1.0
        assert m1["Name"] == "alloc-rate"
        assert m1["Increment"] == 4096.0
        assert m1["CounterType"] == "Sum"

    def test_unknown_metadata_id_dropped(self):
        # event_parser.go:70-76 — no metadata → empty metric → dropped
        data = encode_counter_stream([MEAN], unknown_event=True)
        assert len(parse_stream(data)) == 1

    def test_stack_and_sp_blocks_skipped(self):
        for st, sp in ((False, False), (True, False), (False, True), (True, True)):
            data = encode_counter_stream([MEAN], with_stack_block=st,
                                         with_sp_block=sp)
            assert len(parse_stream(data)) == 1

    def test_event_after_sequence_point_reset(self):
        # parser.go:113-119 — the byte counter resets at the SPBlock;
        # alignment of later blocks is relative to the reset counter
        data = encode_counter_stream([MEAN], post_sp_event=True)
        ms = parse_stream(data)
        assert len(ms) == 2
        assert ms[1]["Name"] == "cpu-usage"

    def test_bad_ipc_magic(self):
        data = bytearray(encode_counter_stream([MEAN]))
        data[0] = ord("X")
        with pytest.raises(ValueError, match="magic"):
            parse_stream(bytes(data))

    def test_ipc_error_response(self):
        # ipc_parser.go:80-93 — responseID 0xFF is an error
        data = bytearray(encode_counter_stream([MEAN]))
        data[17] = 0xFF
        with pytest.raises(ValueError, match="error response"):
            parse_stream(bytes(data))

    def test_bad_nettrace_name(self):
        data = bytearray(encode_counter_stream([MEAN]))
        data[28] = ord("X")  # first byte of "Nettrace"
        with pytest.raises(ValueError, match="header name"):
            parse_stream(bytes(data))

    def test_unknown_block_type_is_error(self):
        # parser.go:121-123
        data = encode_counter_stream([MEAN])
        # splice a bogus block name by re-encoding with a hacked stream:
        # replace "StackBlock" with "WrongBlock" (same length)
        assert b"StackBlock" in data
        bad = data.replace(b"StackBlock", b"WrongBlock")
        with pytest.raises(ValueError, match="unknown serialization type"):
            parse_stream(bad)


class TestCursor:
    def test_compressed_uints(self):
        from opentelemetry_collector_contrib_ray.sources.dotnet import _Writer

        w = _Writer()
        for v in (0, 1, 127, 128, 300, 2**21 - 1, 2**28 + 5):
            w.cuint(v)
        c = _Cursor(bytes(w.buf))
        for v in (0, 1, 127, 128, 300, 2**21 - 1, 2**28 + 5):
            assert c.cuint() == v

    def test_compressed_too_long(self):
        c = _Cursor(b"\x80" * 10)
        with pytest.raises(ValueError, match="too long"):
            c.cuint()

    def test_align_relative_to_reset(self):
        c = _Cursor(b"\x00" * 16)
        c.seek(3)
        c.align()
        assert c.pos() == 4
        c.reset()
        assert c.pos() == 0
        c.seek(1)
        c.align()
        assert c.pos() == 4  # relative to reset point


class TestConversion:
    # metrics/converter.go:40-77
    def test_mean_and_sum_rows(self):
        rows = raw_metric_rows(parse_stream(encode_counter_stream([MEAN, SUM])))
        assert rows[0]["name"] == "dotnet.cpu-usage"
        assert rows[0]["mtype"] == "gauge"
        assert rows[0]["value"] == 12.5
        assert rows[0]["unit"] == "%"
        assert rows[0]["description"] == "CPU Usage"
        assert rows[1]["name"] == "dotnet.alloc-rate"
        assert rows[1]["mtype"] == "sum_delta"
        assert rows[1]["value"] == 4096.0
        assert rows[1]["unit"] == "By"  # B → By

    def test_unit_mapping(self):
        assert map_units("B") == "By"
        assert map_units("MB") == "MB"
        assert map_units("%") == "%"

    def test_unknown_counter_type_skipped(self):
        rows = raw_metric_rows([{"CounterType": "Weird", "Name": "x"}])
        assert rows == []


class TestStage:
    def test_parse_dotnet_counters_table(self):
        blobs = [encode_counter_stream([MEAN, SUM]),
                 encode_counter_stream([SUM])]
        t = pa.table(
            {"server_id": pa.array([10, 20], pa.int64()),
             "payload": pa.array(blobs, pa.binary())}
        )
        out = parse_dotnet_counters(t).to_pandas()
        assert len(out) == 3
        assert list(out["name"]) == [
            "dotnet.cpu-usage.gauge", "dotnet.alloc-rate.sum_delta",
            "dotnet.alloc-rate.sum_delta",
        ]
        assert list(out["label_value"]) == ["%", "By", "By"]
        assert list(out["value_int"]) == [7, 0, 0]
        assert list(out["value_double"]) == [12.5, 4096.0, 4096.0]
