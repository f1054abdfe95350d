"""Property-based tests (hypothesis) for core kernels: router scatter
round-trip, severity conversion totality, token checksum sensitivity,
salted aggregation partition-independence."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from opentelemetry_collector_contrib_ray._util import splitmix64
from opentelemetry_collector_contrib_ray.functions.severity import convert_severity
from opentelemetry_collector_contrib_ray.functions.tokens import token_checksum
from opentelemetry_collector_contrib_ray.stages.parse import _scatter


@given(
    st.lists(st.booleans(), min_size=1, max_size=200),
    st.integers(min_value=0, max_value=1000),
)
@settings(max_examples=50, deadline=None)
def test_scatter_roundtrip(mask_list, base):
    """Scatter places masked values at masked positions, nulls elsewhere."""
    mask = np.array(mask_list, dtype=bool)
    k = int(mask.sum())
    small = pa.array([base + i for i in range(k)], pa.int64())
    out = _scatter(small, mask, len(mask))
    vals = out.to_pylist()
    it = iter(range(k))
    for m, v in zip(mask, vals):
        assert v == (base + next(it) if m else None)


@given(st.lists(st.integers(min_value=-5, max_value=120), min_size=1, max_size=64))
@settings(max_examples=100, deadline=None)
def test_severity_conversion_total(levels):
    """Every level maps to a (text, number) pair; number 0 iff Undefined
    (converter.go:532-582 is a total switch)."""
    text, num = convert_severity(np.array(levels, dtype=np.int32))
    for lv, t, n in zip(levels, text, num):
        assert t in {"Trace", "Debug", "Info", "Error", "Fatal", "Undefined"}
        assert (t == "Undefined") == (n == 0)
        if lv <= 0:
            assert t == "Undefined"
        if lv > 0:
            assert n > 0


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=50256), min_size=1, max_size=20),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=50, deadline=None)
def test_token_checksum_order_sensitive(rows):
    """Per-row checksum changes when any token changes or order flips."""
    col = pa.array(rows, pa.list_(pa.int32()))
    base = token_checksum(col)
    # mutate first row's first token
    mutated = [list(r) for r in rows]
    mutated[0][0] = (mutated[0][0] + 1) % 50257
    m1 = token_checksum(pa.array(mutated, pa.list_(pa.int32())))
    assert m1[0] != base[0]
    assert (m1[1:] == base[1:]).all()
    # swapping two distinct tokens changes the row checksum
    if len(rows[0]) >= 2 and rows[0][0] != rows[0][1]:
        swapped = [list(r) for r in rows]
        swapped[0][0], swapped[0][1] = swapped[0][1], swapped[0][0]
        s1 = token_checksum(pa.array(swapped, pa.list_(pa.int32())))
        assert s1[0] != base[0]


@given(st.integers(min_value=0, max_value=2**63))
@settings(max_examples=200, deadline=None)
def test_splitmix_deterministic_and_mixing(x):
    a = splitmix64(np.array([x], dtype=np.uint64))
    b = splitmix64(np.array([x], dtype=np.uint64))
    assert a[0] == b[0]
    c = splitmix64(np.array([x + 1], dtype=np.uint64))
    assert a[0] != c[0]
