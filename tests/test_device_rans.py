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


# ------------------------------------------------------- pallas drain --

from lic_tpu.coding.pallas_rans import pallas_drain  # noqa: E402


def _drain_scan(dev, lanes, pay, rows_flat, s_tot):
    """The scan-of-decode_chunk reference the pallas kernel replaces."""
    import jax
    import jax.numpy as jnp

    b, s = rows_flat.shape
    L = dev.n_lanes
    mc = -(-s // L)
    rows_pad = np.zeros((b, mc * L), np.int32)
    rows_pad[:, :s] = rows_flat
    rows_sc = jnp.asarray(rows_pad.reshape(b, mc, L).transpose(1, 0, 2))
    valid_sc = (
        np.arange(mc)[:, None] * L + np.arange(L)[None, :]
    ) < s_tot

    def chunk(lanes, xs):
        rk, vd = xs
        vals, lanes = dev.decode_chunk(
            lanes, pay, rk, jnp.broadcast_to(vd, (b, L))
        )
        return lanes, vals

    lanes, dec = jax.lax.scan(chunk, lanes, (rows_sc, jnp.asarray(valid_sc)))
    return lanes, np.asarray(dec).transpose(1, 0, 2).reshape(b, -1)[:, :s]


@pytest.mark.parametrize("with_escapes", [False, True])
@pytest.mark.parametrize("n_lanes", [8, 32, 64, 128])
def test_pallas_drain_matches_scan(tables, with_escapes, n_lanes):
    """Whole-drain pallas kernel (interpret mode) is lane-for-lane equal
    to the chunked decode_chunk scan: values, final states, pointers."""
    import jax.numpy as jnp

    cdfs, offsets = tables
    step_counts = np.asarray([137])
    n = int(step_counts.sum())
    sym, idx = _random_case(tables, 30, n, with_escapes, cdfs.shape[0])
    codec = Rans16InterleavedCodec(cdfs, offsets)
    blob = codec.encode(sym, idx, step_counts, n_lanes)
    _, payload = Rans16InterleavedCodec.parse(blob)
    pay = jnp.asarray(np.pad(payload.astype(np.int32), (0, n_lanes))[None])

    dev = DeviceRans16Interleaved(cdfs, offsets, n_lanes)
    rows = jnp.asarray(idx[None])

    l_ref, dec_ref = _drain_scan(dev, dev.init_lanes(pay), pay, rows, n)
    l_pal, dec_pal = pallas_drain(
        dev, dev.init_lanes(pay), pay, rows, n, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(dec_pal), dec_ref)
    np.testing.assert_array_equal(np.asarray(dec_pal)[0], sym)
    np.testing.assert_array_equal(
        np.asarray(l_pal.state), np.asarray(l_ref.state)
    )
    np.testing.assert_array_equal(
        np.asarray(l_pal.ptr), np.asarray(l_ref.ptr)
    )


def test_pallas_drain_multiphase_batched(tables):
    """Charm-style usage: several sequential drains threading lane state,
    over a BATCH of independent streams (one with escapes)."""
    import jax.numpy as jnp

    cdfs, offsets = tables
    n_lanes = 16
    step_counts = np.asarray([40, 9, 33])
    n = int(step_counts.sum())
    codec = Rans16InterleavedCodec(cdfs, offsets)
    syms, idxs, pays = [], [], []
    for seed, esc in ((31, False), (32, True)):
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
    pay = jnp.asarray(pay2)
    idx2 = np.stack(idxs)

    dev = DeviceRans16Interleaved(cdfs, offsets, n_lanes)
    lanes = dev.init_lanes(pay)
    out = np.zeros((2, n), np.int32)
    off = 0
    for m in step_counts:
        lanes, dec = pallas_drain(
            dev, lanes, pay, jnp.asarray(idx2[:, off : off + m]), int(m),
            interpret=True,
        )
        out[:, off : off + m] = np.asarray(dec)
        off += m
    np.testing.assert_array_equal(out, np.stack(syms))
    np.testing.assert_array_equal(
        np.asarray(lanes.state), np.full((2, n_lanes), 1 << 16, np.uint32)
    )
    np.testing.assert_array_equal(
        np.asarray(lanes.ptr), np.asarray([p.size for p in pays])
    )


def test_pallas_drain_traced_s_tot(tables):
    """NS-wavefront usage: s_tot is TRACED and smaller than the padded
    rows width — the valid prefix decodes, the tail returns zeros."""
    import jax
    import jax.numpy as jnp

    cdfs, offsets = tables
    n_lanes = 8
    n = 29
    sym, idx = _random_case(tables, 33, n, True, cdfs.shape[0])
    codec = Rans16InterleavedCodec(cdfs, offsets)
    blob = codec.encode(sym, idx, np.asarray([n]), n_lanes)
    _, payload = Rans16InterleavedCodec.parse(blob)
    pay = jnp.asarray(np.pad(payload.astype(np.int32), (0, n_lanes))[None])
    dev = DeviceRans16Interleaved(cdfs, offsets, n_lanes)

    pad_s = 48  # padded width (p_max*c analog) > n
    rows_pad = np.zeros((1, pad_s), np.int32)
    rows_pad[0, :n] = idx

    def run(s_tot):
        return pallas_drain(
            dev, dev.init_lanes(pay), pay, jnp.asarray(rows_pad), s_tot,
            interpret=True,
        )

    lanes, dec = jax.jit(run)(jnp.int32(n))
    dec = np.asarray(dec)
    np.testing.assert_array_equal(dec[0, :n], sym)
    np.testing.assert_array_equal(dec[0, n:], 0)
    np.testing.assert_array_equal(
        np.asarray(lanes.state), np.full((1, n_lanes), 1 << 16, np.uint32)
    )


def test_pallas_drain_segmented(tables, monkeypatch):
    """Large drains split into sequential segment calls threading lane
    state — force a tiny budget and check parity with the one-call path."""
    import jax.numpy as jnp
    from lic_tpu.coding import pallas_rans

    cdfs, offsets = tables
    n_lanes = 8
    n = 200
    sym, idx = _random_case(tables, 34, n, True, cdfs.shape[0])
    codec = Rans16InterleavedCodec(cdfs, offsets)
    blob = codec.encode(sym, idx, np.asarray([n]), n_lanes)
    _, payload = Rans16InterleavedCodec.parse(blob)
    pay = jnp.asarray(np.pad(payload.astype(np.int32), (0, n_lanes))[None])
    dev = DeviceRans16Interleaved(cdfs, offsets, n_lanes)

    monkeypatch.setattr(pallas_rans, "_SEG_BUDGET_BYTES", 4 * n_lanes * 4 * 2)
    lanes, dec = pallas_drain(
        dev, dev.init_lanes(pay), pay, jnp.asarray(idx[None]), n,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(dec)[0], sym)
    np.testing.assert_array_equal(
        np.asarray(lanes.state), np.full((1, n_lanes), 1 << 16, np.uint32)
    )
    np.testing.assert_array_equal(np.asarray(lanes.ptr), [payload.size])
