"""HyperLogLog sketch (operators/sketches.py): python-replica parity,
accuracy band on adversarial inputs, merge losslessness, validation."""

import pytest

from pyspark.sql import functions as F

from osmium_tool_spark.operators.sketches import (
    A_MIX,
    P31,
    _alpha,
    hll_distinct,
    hll_estimate,
    hll_merge,
    hll_registers,
    rho_cap_portable,
)

M32 = 0xFFFFFFFF


def py_h32(v: int) -> int:
    x = ((v % P31) + P31) % P31
    x = (((x >> 16) ^ x) * A_MIX) & M32
    x = (((x >> 16) ^ x) * A_MIX) & M32
    return (x >> 16) ^ x


def py_hll(values, p):
    """Pure-python replica of registers + estimate components."""
    m = 1 << p
    cap = rho_cap_portable(p)
    regs = {}
    for v in values:
        x = py_h32(v)
        j = x & (m - 1)
        w = x >> p
        if w == 0:
            rho = cap
        else:
            rho = ((w & -w).bit_length() - 1) + 1
        regs[j] = max(regs.get(j, 0), rho)
    v_zero = m - len(regs)
    t = (v_zero << cap) + sum(1 << (cap - min(mm, cap)) for mm in regs.values())
    est = _alpha(m) * m * m * float(1 << cap) / float(t)
    return v_zero, max(regs.values(), default=0), t, est


def test_matches_python_replica(spark):
    vals = [i * 37 % 12347 for i in range(30_000)] + [i * 1_000_003 for i in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = hll_distinct(df, [], "v", p=8, hash="portable").collect()
    # groupBy() with no keys -> one global row
    assert len(got) == 1
    r = got[0]
    v_zero, k_max, t, est = py_hll(vals, p=8)
    assert (r.v_zero, r.k_max, r.t_scaled) == (v_zero, k_max, t)
    assert r.est_raw == pytest.approx(est, rel=0, abs=0)  # bit-identical


@pytest.mark.parametrize(
    "shape, vals",
    [
        ("prog37", [(i * 37) % 12347 for i in range(60_000)]),
        ("seq", list(range(50_000))),
        ("strided", [i * 1_000_003 for i in range(40_000)]),
        ("shifted", [i << 16 for i in range(30_000)]),
    ],
)
def test_accuracy_band_structured_inputs(shape, vals):
    """Raw-regime error stays within 3 sigma of 1.04/sqrt(m) on
    adversarially structured (non-random) key sets — the multiplicative
    avalanche hash does not fall apart the way a bare LCG mix does."""
    p = 10
    n = len(set(vals))
    _, _, _, est = py_hll(vals, p)
    sigma = 1.04 / (1 << p) ** 0.5
    assert abs(est / n - 1) < 3 * sigma, f"{shape}: {est}/{n}"


def test_grouped_and_null_filtering(spark):
    df = spark.createDataFrame(
        [(i % 3, i % 1000 if i % 11 else None) for i in range(20_000)],
        "g long, v long",
    )
    out = {r.g: r for r in hll_distinct(df, ["g"], "v", p=8, hash="portable").collect()}
    assert set(out) == {0, 1, 2}
    for g in out:
        vals = [i % 1000 for i in range(20_000) if i % 3 == g and i % 11]
        assert (out[g].v_zero, out[g].k_max, out[g].t_scaled) == py_hll(vals, 8)[:3]


def test_merge_lossless(spark):
    df = spark.createDataFrame([(i % 5, (i * 13) % 4000) for i in range(30_000)], "g long, v long")
    whole = hll_distinct(df, ["g"], "v", p=9, hash="portable")
    ra = hll_registers(df.filter("v % 2 = 0"), ["g"], "v", p=9, hash="portable")
    rb = hll_registers(df.filter("v % 2 = 1"), ["g"], "v", p=9, hash="portable")
    merged = hll_estimate(hll_merge(ra, rb), ["g"], p=9)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_xxhash64_family(spark):
    """Production hash family: estimate lands in the error band and the
    distinct shape matches; works on strings too."""
    n = 25_000
    df = spark.range(n * 4).select(
        F.concat(F.lit("img-"), (F.col("id") % n).cast("string")).alias("v")
    )
    r = hll_distinct(df, [], "v", p=10, hash="xxhash64").collect()[0]
    assert abs(r.est_raw / n - 1) < 3 * 1.04 / 32


def test_empty_input_global_sketch(spark):
    """A global aggregate over an empty input is the empty sketch:
    v_zero = m, exact zero under the linear-counting correction."""
    df = spark.range(0).select(F.col("id").alias("v"))
    r = hll_distinct(df, [], "v", p=8, hash="portable", corrected=True).collect()[0]
    assert r.v_zero == 256 and r.k_max == 0
    assert r.t_scaled == 256 << rho_cap_portable(8)
    assert r.est == 0.0


def test_corrected_small_range(spark):
    df = spark.range(80).select((F.col("id") % 40).alias("v"))
    r = hll_distinct(df, [], "v", p=10, hash="portable", corrected=True).collect()[0]
    # linear counting is near-exact at n << m
    assert abs(r.est - 40) < 3


def test_validation():
    from osmium_tool_spark.operators.sketches import _check_p

    with pytest.raises(ValueError, match="p must be"):
        _check_p(3)
    with pytest.raises(ValueError, match="p must be"):
        _check_p(22)


def test_bad_hash_family(spark):
    df = spark.range(10).select(F.col("id").alias("v"))
    with pytest.raises(ValueError, match="hash must be"):
        hll_registers(df, [], "v", p=8, hash="md5")


def test_merge_requires_input():
    with pytest.raises(ValueError, match="at least one"):
        hll_merge()
