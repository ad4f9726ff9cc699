"""Bloom sidecar primitives (pure numpy — no SparkSession needed):
no-false-negatives is the correctness-critical property (a false negative
would silently keep a duplicate); save/load must round-trip bit-exactly."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from dataflow_spark.streaming.bloom import (
    bloom_m_for,
    load_bloom,
    might_contain_vec,
    save_bloom,
    set_bits,
)


def _h(keys):
    """stand-in for the xxhash64 pair: any 64-bit values work — the Bloom
    math only sees (h1, h2) uint64s."""
    rng = np.random.RandomState(7)
    h = rng.randint(-(2 ** 63), 2 ** 63 - 1, size=(len(keys), 2), dtype=np.int64)
    return h[:, 0].view(np.uint64), h[:, 1].view(np.uint64)


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=1, max_value=500), st.integers(min_value=1, max_value=200))
def test_no_false_negatives(n_inserted, n_probe_extra):
    m = bloom_m_for(n_inserted)
    bits = np.zeros(m // 64, dtype=np.uint64)
    u1, u2 = _h(list(range(n_inserted + n_probe_extra)))
    set_bits(bits, m, u1[:n_inserted], u2[:n_inserted])
    # every inserted key MUST be reported present
    assert might_contain_vec(bits, m, u1[:n_inserted], u2[:n_inserted]).all()


def test_false_positive_rate_is_low():
    n = 5000
    m = bloom_m_for(n)
    bits = np.zeros(m // 64, dtype=np.uint64)
    u1, u2 = _h(list(range(n * 3)))
    set_bits(bits, m, u1[:n], u2[:n])
    fp = might_contain_vec(bits, m, u1[n:], u2[n:]).mean()
    assert fp < 0.01, f"fp rate {fp}"  # design: ~7e-4 at 16 bits/key, k=7


def test_sidecar_roundtrip(tmp_path):
    m = bloom_m_for(100)
    bits = np.zeros(m // 64, dtype=np.uint64)
    u1, u2 = _h(list(range(100)))
    set_bits(bits, m, u1, u2)
    save_bloom(str(tmp_path), bits, m)
    loaded = load_bloom(str(tmp_path))
    assert loaded is not None
    b2, m2 = loaded
    assert m2 == m and np.array_equal(b2, bits)
    assert load_bloom(str(tmp_path / "missing")) is None


def test_build_bloom_packed_path_bit_identical(spark, monkeypatch):
    """Above _FLAGS_MAX_BITS build_bloom scatters into packed words
    (m/8 bytes per task) instead of a byte-per-bit flags array. The two
    paths must produce the identical bitmap — force the packed path by
    dropping the threshold below any real filter size."""
    import dataflow_spark.streaming.bloom as bloom_mod
    from dataflow_spark.streaming.bloom import build_bloom

    rows = [(f"band-{i}",) for i in range(400)]
    bands = spark.createDataFrame(rows, "band string")

    bits_flags, m1 = build_bloom(bands, 400)
    monkeypatch.setattr(bloom_mod, "_FLAGS_MAX_BITS", 1)
    bits_packed, m2 = build_bloom(bands, 400)

    assert m1 == m2
    assert np.array_equal(bits_flags, bits_packed)
    # and the packed-path filter still has no false negatives
    from dataflow_spark.streaming.bloom import band_hash_cols

    hdf = bands.select(*band_hash_cols("band")).toPandas()
    u1 = hdf["__h1"].to_numpy().astype(np.int64).view(np.uint64)
    u2 = hdf["__h2"].to_numpy().astype(np.int64).view(np.uint64)
    assert might_contain_vec(bits_packed, m2, u1, u2).all()
