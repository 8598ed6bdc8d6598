"""Lane-parallel rans16: host encoder ↔ C++ mirror ↔ jax device decoder."""

import numpy as np
import pytest

from lic_tpu.coding.codec import GaussianCoder
from lic_tpu.coding.device_rans import (
    DeviceRans16,
    Rans16LaneCodec,
    lane_schedule,
)


@pytest.fixture(scope="module")
def tables():
    g = GaussianCoder(radius=16)  # small tables: row_len = 2*16+1+2 = 35
    return g.codec.cdfs, g.codec.offsets


def _random_case(tables, seed, n, with_escapes, rows):
    cdfs, offsets = tables
    rng = np.random.default_rng(seed)
    nsyms = cdfs.shape[1] - 2
    idx = rng.integers(0, cdfs.shape[0], n).astype(np.int32)
    lo = offsets[idx]
    sym = (lo + rng.integers(0, nsyms, n)).astype(np.int32)
    if with_escapes:
        k = max(1, n // 17)
        pos = rng.choice(n, k, replace=False)
        sym[pos] = rng.integers(-5000, 5000, k).astype(np.int32)
        # extreme deltas (|δ| ≥ 2^30, zigzag ≥ 2^31): the device unzigzag
        # must use uint32 logical shifts — int32 sign-extension decodes
        # these wrong while the stream integrity check still passes
        sym[pos[0]] = (1 << 30) + 12345
        if k > 1:
            sym[pos[1]] = -((1 << 30) + 999)
    return sym, idx


def _chunks(step_counts, n_lanes):
    """Yield (flat_slice, within-chunk valid count) in device decode order."""
    off = 0
    for m in step_counts:
        k = 0
        while k * n_lanes < m:
            lo = off + k * n_lanes
            hi = off + min((k + 1) * n_lanes, m)
            yield lo, hi
            k += 1
        off += m


@pytest.mark.parametrize("with_escapes", [False, True])
@pytest.mark.parametrize("n_lanes", [7, 32])
def test_host_roundtrip(tables, with_escapes, n_lanes):
    cdfs, offsets = tables
    step_counts = np.asarray([5, 1, 19, 40, 3, 64, 2])
    n = int(step_counts.sum())
    sym, idx = _random_case(tables, 0, n, with_escapes, cdfs.shape[0])
    codec = Rans16LaneCodec(cdfs, offsets)
    blob = codec.encode(sym, idx, step_counts, n_lanes)
    out = codec.decode_host(blob, idx, step_counts)
    np.testing.assert_array_equal(out, sym)


def test_truncated_stream_raises(tables):
    cdfs, offsets = tables
    step_counts = np.asarray([30, 30])
    sym, idx = _random_case(tables, 1, 60, True, cdfs.shape[0])
    codec = Rans16LaneCodec(cdfs, offsets)
    blob = codec.encode(sym, idx, step_counts, 8)
    with pytest.raises(ValueError):
        codec.decode_host(blob[:-6], idx, step_counts)


@pytest.mark.parametrize("with_escapes", [False, True])
@pytest.mark.parametrize("n_lanes", [8, 32])
def test_device_decoder_matches(tables, with_escapes, n_lanes):
    import jax
    import jax.numpy as jnp

    cdfs, offsets = tables
    step_counts = np.asarray([3, 60, 1, 31, 33, 64, 7])
    n = int(step_counts.sum())
    sym, idx = _random_case(tables, 2, n, with_escapes, cdfs.shape[0])
    codec = Rans16LaneCodec(cdfs, offsets)
    blob = codec.encode(sym, idx, step_counts, n_lanes)

    n_l, wstarts, payload = Rans16LaneCodec.parse(blob)
    assert n_l == n_lanes
    dev = DeviceRans16(cdfs, offsets)
    pay = jnp.asarray(payload.astype(np.int32))
    lanes = dev.init_lanes(pay, jnp.asarray(wstarts[:-1].astype(np.int32)))

    step = jax.jit(dev.decode_chunk)
    out = np.zeros(n, np.int32)
    for lo, hi in _chunks(step_counts, n_lanes):
        m = hi - lo
        rows = np.zeros(n_lanes, np.int32)
        rows[:m] = idx[lo:hi]
        valid = np.zeros(n_lanes, bool)
        valid[:m] = True
        vals, lanes = step(
            lanes, pay, jnp.asarray(rows), jnp.asarray(valid)
        )
        out[lo:hi] = np.asarray(vals)[:m]
    np.testing.assert_array_equal(out, sym)

    # clean end: every lane state back at the interval bound, all words read
    np.testing.assert_array_equal(
        np.asarray(lanes.state), np.full(n_lanes, 1 << 16, np.uint32)
    )
    np.testing.assert_array_equal(np.asarray(lanes.ptr), wstarts[1:])


def test_lane_schedule_partition():
    counts = np.asarray([5, 0, 12, 3])
    perm, starts = lane_schedule(counts, 4)
    assert perm.size == 20
    assert sorted(perm.tolist()) == list(range(20))
    assert starts[-1] == 20


# ----------------------------------------------------------- interleaved --

from lic_tpu.coding.device_rans import (  # noqa: E402
    DeviceRans16Interleaved,
    Rans16InterleavedCodec,
)


@pytest.mark.parametrize("with_escapes", [False, True])
@pytest.mark.parametrize("n_lanes", [7, 32])
def test_rans16i_host_roundtrip(tables, with_escapes, n_lanes):
    cdfs, offsets = tables
    step_counts = np.asarray([5, 1, 19, 40, 3, 64, 2])
    n = int(step_counts.sum())
    sym, idx = _random_case(tables, 10, n, with_escapes, cdfs.shape[0])
    codec = Rans16InterleavedCodec(cdfs, offsets)
    blob = codec.encode(sym, idx, step_counts, n_lanes)
    out = codec.decode_host(blob, idx, step_counts)
    np.testing.assert_array_equal(out, sym)
    # no per-lane count table: vs the segmented container the interleaved
    # one saves >= 4 bytes/lane minus constant head differences
    seg = Rans16LaneCodec(cdfs, offsets).encode(sym, idx, step_counts, n_lanes)
    assert len(blob) < len(seg)


def test_rans16i_truncated_raises(tables):
    cdfs, offsets = tables
    step_counts = np.asarray([30, 30])
    sym, idx = _random_case(tables, 11, 60, True, cdfs.shape[0])
    codec = Rans16InterleavedCodec(cdfs, offsets)
    blob = codec.encode(sym, idx, step_counts, 8)
    with pytest.raises(ValueError):
        codec.decode_host(blob[:-6], idx, step_counts)


@pytest.mark.parametrize("with_escapes", [False, True])
@pytest.mark.parametrize("n_lanes", [8, 32])
def test_rans16i_device_decoder_matches(tables, with_escapes, n_lanes):
    import jax
    import jax.numpy as jnp

    cdfs, offsets = tables
    step_counts = np.asarray([3, 60, 1, 31, 33, 64, 7])
    n = int(step_counts.sum())
    sym, idx = _random_case(tables, 12, n, with_escapes, cdfs.shape[0])
    codec = Rans16InterleavedCodec(cdfs, offsets)
    blob = codec.encode(sym, idx, step_counts, n_lanes)

    n_l, payload = Rans16InterleavedCodec.parse(blob)
    assert n_l == n_lanes
    dev = DeviceRans16Interleaved(cdfs, offsets, n_lanes)
    # pad the payload with L zeros so window slices stay in bounds
    pay = jnp.asarray(
        np.pad(payload.astype(np.int32), (0, n_lanes))[None]
    )
    lanes = dev.init_lanes(pay)

    step = jax.jit(dev.decode_chunk)
    out = np.zeros(n, np.int32)
    for lo, hi in _chunks(step_counts, n_lanes):
        m = hi - lo
        rows = np.zeros(n_lanes, np.int32)
        rows[:m] = idx[lo:hi]
        valid = np.zeros(n_lanes, bool)
        valid[:m] = True
        vals, lanes = step(
            lanes, pay, jnp.asarray(rows)[None], jnp.asarray(valid)[None]
        )
        out[lo:hi] = np.asarray(vals)[0, :m]
    np.testing.assert_array_equal(out, sym)

    # clean end: all lane states back at the interval bound, all words read
    np.testing.assert_array_equal(
        np.asarray(lanes.state), np.full((1, n_lanes), 1 << 16, np.uint32)
    )
    assert int(lanes.ptr[0]) == payload.size


def test_rans16i_device_batched_streams(tables):
    """Two independent streams of different lengths decode side by side:
    per-stream shared pointers advance independently."""
    import jax
    import jax.numpy as jnp

    cdfs, offsets = tables
    n_lanes = 16
    step_counts = np.asarray([40, 9, 33])
    n = int(step_counts.sum())
    codec = Rans16InterleavedCodec(cdfs, offsets)
    syms, idxs, pays = [], [], []
    for seed, esc in ((20, False), (21, True)):
        sym, idx = _random_case(tables, seed, n, esc, cdfs.shape[0])
        blob = codec.encode(sym, idx, step_counts, n_lanes)
        _, payload = Rans16InterleavedCodec.parse(blob)
        syms.append(sym)
        idxs.append(idx)
        pays.append(payload.astype(np.int32))
    wmax = max(p.size for p in pays) + n_lanes
    pay2 = np.zeros((2, wmax), np.int32)
    for i, p in enumerate(pays):
        pay2[i, : p.size] = p

    dev = DeviceRans16Interleaved(cdfs, offsets, n_lanes)
    pay = jnp.asarray(pay2)
    lanes = dev.init_lanes(pay)
    step = jax.jit(dev.decode_chunk)
    out = np.zeros((2, n), np.int32)
    idx2 = np.stack(idxs)
    for lo, hi in _chunks(step_counts, n_lanes):
        m = hi - lo
        rows = np.zeros((2, n_lanes), np.int32)
        rows[:, :m] = idx2[:, lo:hi]
        valid = np.zeros((2, n_lanes), bool)
        valid[:, :m] = True
        vals, lanes = step(lanes, pay, jnp.asarray(rows), jnp.asarray(valid))
        out[:, lo:hi] = np.asarray(vals)[:, :m]
    np.testing.assert_array_equal(out, np.stack(syms))
    np.testing.assert_array_equal(
        np.asarray(lanes.ptr), np.asarray([p.size for p in pays])
    )
