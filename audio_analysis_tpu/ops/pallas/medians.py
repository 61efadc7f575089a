"""Masked-median rank search as single-pass Pallas kernels.

The detect program thresholds the [bins, T] magnitude spectrogram against
np.median over each axis (reference src/identify_tracks.py:650-656). The
XLA implementation (`detect/signal_noise._masked_medians_rowcol`) walks a
quaternary binary search over the bitcast-int32 values — exact, but every
narrowing step re-streams the spectrogram from HBM (measured ~47 ms of the
149 ms fused detect batch; a multi-phase Pallas port of the same structure
measured no better — 288 GB/s effective, still one HBM stream per phase).

The winning structure: a median along an axis only needs the values ON that
axis, so a tile that contains the ENTIRE reduction axis can run the whole
narrowing search in-kernel against its resident VMEM copy — one HBM fetch
per element, with the narrowing loop hitting VMEM at register speed. Two
kernels therefore:

- row medians: tiles of [RT, T] (full width — also the DMA-friendly layout:
  each fetched row is contiguous in HBM);
- column medians: tiles of [bins, TC] (full height).

Each grid step is fully independent: no cross-tile accumulators, no phase
grid dim, no scratch persistence. In-kernel the narrowing is BINARY (the
XLA path's is quaternary — right when every phase is an HBM stream, wrong
when the cost is VPU ops: see N_NARROW below); both converge to the exact
k-th smallest bit pattern, so the medians stay bit-identical — pinned by
test against np.median and against the XLA path.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 31 binary narrowing phases collapse the full [0, 2^31-1] bit span to a
# single value. The XLA path (detect/signal_noise._masked_medians_rowcol)
# narrows QUATERNARY because each phase there is an HBM stream — fewer
# phases win; in-kernel the tile is VMEM-resident and the cost is VPU ops
# per element: binary is ~3 ops/bit (compare+convert+add) vs quaternary's
# ~4.5 (three sibling counts per 2 bits). Bit-identity with the XLA path
# is preserved because both searches converge to the exact k-th smallest
# bit pattern (rank selection is unique) — pinned by test.
N_NARROW = 31
_INF_BITS = 0x7F800000  # +inf bits, matching the XLA path's successor
# (plain python ints: jnp scalar constants would be captured by the kernel)
RT = 64  # rows per row-median tile ([RT, T] f32 ~2.7 MB at T~10.4k)
TC = 512  # columns per col-median tile ([bins, TC] f32 ~4.2 MB at 2056)


def _search(xi, counted, k1, k2, axis):
    """Binary rank search + upper-middle resolution over one axis of the
    in-VMEM tile. `counted` masks which elements participate; k1/k2 are the
    lower/upper middle ranks (scalars or per-line vectors). Returns the
    median line (keepdims).

    Masked elements are substituted with the +inf sentinel ONCE up front —
    the XLA path's exact spec_inf semantics (midpoints stay below the
    sentinel for real data, so they are never counted and only win the
    successor min when no real successor exists — i.e. never for reachable
    ranks) — which keeps the loop compares free of a per-element mask."""
    xi = jnp.where(counted, xi, _INF_BITS)
    red = (xi.shape[0], 1) if axis == 1 else (1, xi.shape[1])
    lo0 = jnp.zeros(red, jnp.int32)
    hi0 = jnp.full(red, 2**31 - 1, jnp.int32)

    def body(_, st):
        # same invariant as detect/signal_noise._masked_median_fast:
        # count(<= m) >= k1+1 keeps hi at m, else lo moves past m; after 31
        # halvings lo == hi == the k1-th smallest bit pattern exactly
        lo, hi = st
        m = lo + (hi - lo) // 2
        c = jnp.sum((xi <= m).astype(jnp.int32), axis=axis, keepdims=True)
        t = c >= k1 + 1
        return jnp.where(t, lo, m + 1), jnp.where(t, m, hi)

    lo, _ = jax.lax.fori_loop(0, N_NARROW, body, (lo0, hi0))
    cnt = jnp.sum((xi <= lo).astype(jnp.int32), axis=axis, keepdims=True)
    succ = jnp.min(
        jnp.where(xi > lo, xi, _INF_BITS), axis=axis, keepdims=True
    )
    up = jnp.where(cnt >= k2 + 1, lo, succ)
    f = lambda v: jax.lax.bitcast_convert_type(v, jnp.float32)
    return (f(lo) + f(up)) * 0.5


def _kernel_row_medians(nvf_ref, x_ref, out_ref):
    b = pl.program_id(0)
    nvf = nvf_ref[b]
    xi = jax.lax.bitcast_convert_type(x_ref[0], jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, xi.shape, 1)
    out_ref[0] = _search(xi, lane < nvf, (nvf - 1) // 2, nvf // 2, axis=1)


def _kernel_col_medians(x_ref, out_ref, *, n_rows):
    xi = jax.lax.bitcast_convert_type(x_ref[0], jnp.int32)
    sub = jax.lax.broadcasted_iota(jnp.int32, xi.shape, 0)
    out_ref[0] = _search(
        xi, sub < n_rows, (n_rows - 1) // 2, n_rows // 2, axis=0
    )


@partial(jax.jit, static_argnames=("n_rows", "interpret"))
def _medians_core(spec_p, nvf, *, n_rows, interpret=False):
    b, bins_p, t_p = spec_p.shape
    row = pl.pallas_call(
        _kernel_row_medians,
        grid=(b, bins_p // RT),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, RT, t_p), lambda i, r: (i, r, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, RT, 1), lambda i, r: (i, r, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, bins_p, 1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=b * bins_p * t_p * 3 * N_NARROW,
            bytes_accessed=b * bins_p * t_p * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(nvf, spec_p)

    col = pl.pallas_call(
        partial(_kernel_col_medians, n_rows=n_rows),
        grid=(b, t_p // TC),
        in_specs=[
            pl.BlockSpec(
                (1, bins_p, TC), lambda i, c: (i, 0, c), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, TC), lambda i, c: (i, 0, c), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, 1, t_p), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=b * bins_p * t_p * 3 * N_NARROW,
            bytes_accessed=b * bins_p * t_p * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(spec_p)
    return row, col


def pallas_masked_medians_rowcol(spec, nvf, *, interpret=False):
    """np.median of the non-negative [B, bins, T] float32 spectrogram batch
    over each axis — rows over each recording's first `nvf[b]` columns,
    columns over all rows — as two single-pass Pallas programs. Returns
    (row [B, bins, 1], col [B, 1, T]) bit-identical to the valid region of
    `detect/signal_noise._masked_medians_rowcol`; entries for invalid
    columns (>= nvf) are unspecified on BOTH paths — callers mask them.
    """
    b, bins, t = spec.shape
    bins_p = -(-bins // RT) * RT  # row-tile multiple (also sublane-aligned)
    t_p = -(-t // TC) * TC  # col-tile multiple (also lane-aligned)
    # one padded copy serves both kernels; pad values are never counted
    # (row counts mask to lane < nvf <= t, column counts mask to the real
    # rows) and zeros are cheapest to emit
    spec_p = jnp.pad(spec, ((0, 0), (0, bins_p - bins), (0, t_p - t)))
    nvf = jnp.asarray(nvf, jnp.int32).reshape(b)
    row, col = _medians_core(spec_p, nvf, n_rows=bins, interpret=interpret)
    return row[:, :bins], col[:, :, :t]
