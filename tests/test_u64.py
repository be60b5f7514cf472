"""Unit tests for the uint32-pair 64-bit arithmetic library."""
import numpy as np

from ntjoin_tpu.constants import MASK64, MULTI_SEED, nte as nte_py, srol_n
from ntjoin_tpu.ops import u64


def _pairs(vals):
    v = np.asarray(vals, dtype=np.uint64)
    return u64.from_np_u64(v)


def _back(pair):
    return u64.to_np_u64(pair)


RNG = np.random.default_rng(5)
VALS = RNG.integers(0, 1 << 63, size=64, dtype=np.uint64) * 2 + RNG.integers(
    0, 2, size=64, dtype=np.uint64
)
OTHER = RNG.integers(0, MASK64, size=64, dtype=np.uint64, endpoint=True)


def test_roundtrip_xor_add_less():
    a, b = _pairs(VALS), _pairs(OTHER)
    assert (_back(a) == VALS).all()
    assert (_back(u64.xor(a, b)) == (VALS ^ OTHER)).all()
    assert (_back(u64.add(a, b)) == (VALS + OTHER)).all()  # wrapping
    assert (np.asarray(u64.less(a, b)) == (VALS < OTHER)).all()
    assert (np.asarray(u64.less_eq(a, a)) == True).all()  # noqa: E712


def test_srol_const_and_var():
    for n in [0, 1, 7, 32, 33, 62, 1022]:
        got = _back(u64.srol_const(_pairs(VALS), n))
        want = np.array([srol_n(int(v), n) for v in VALS], dtype=np.uint64)
        assert (got == want).all(), n
    exps = RNG.integers(0, 1023, size=64)
    import jax.numpy as jnp

    got = _back(u64.srol_var(_pairs(VALS), jnp.asarray(exps, jnp.uint32)))
    want = np.array(
        [srol_n(int(v), int(e)) for v, e in zip(VALS, exps)], dtype=np.uint64
    )
    assert (got == want).all()


def test_mul_const_shr_nte():
    c = (1 ^ (32 * MULTI_SEED)) & MASK64
    got = _back(u64.mul_const(_pairs(VALS), c))
    want = (VALS * np.uint64(c))  # numpy wraps mod 2^64
    assert (got == want).all()
    got = _back(u64.shr_const(_pairs(VALS), 27))
    assert (got == (VALS >> np.uint64(27))).all()
    got = _back(u64.nte(_pairs(VALS), 32, 1))
    want = np.array([nte_py(int(v), 32, 1) for v in VALS], dtype=np.uint64)
    assert (got == want).all()


def test_srol1_sror1_direct_forms():
    """The direct (lo, hi) srol^1 / srol^-1 forms (hash-kernel hot path)
    match the reference split-group rotation for random 64-bit values."""
    import numpy as np

    from ntjoin_tpu.constants import SROL_PERIOD, srol_n
    from ntjoin_tpu.ops import u64

    rng = np.random.default_rng(17)
    vals = rng.integers(0, 1 << 64, 2048, dtype=np.uint64)
    pair = u64.from_np_u64(vals)
    want1 = np.array([srol_n(int(v), 1) for v in vals], dtype=np.uint64)
    wantm = np.array(
        [srol_n(int(v), SROL_PERIOD - 1) for v in vals], dtype=np.uint64
    )
    assert (u64.to_np_u64(u64.srol1(pair)) == want1).all()
    assert (u64.to_np_u64(u64.sror1(pair)) == wantm).all()
    # srol_const dispatches the hot exponents to the direct forms
    assert (u64.to_np_u64(u64.srol_const(pair, 1)) == want1).all()
    assert (u64.to_np_u64(u64.srol_const(pair, 33 * 31 - 1)) == wantm).all()
