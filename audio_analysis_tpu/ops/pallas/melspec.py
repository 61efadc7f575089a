"""Fused windowed-DFT -> power -> mel kernel (Pallas, MXU).

The XLA path materialises the full |STFT| array ([n_frames, 2049] floats) in
HBM between the FFT and the mel matmul. This kernel reformulates the rFFT as
two real matmuls against hann-folded DFT matrices and fuses power + the mel
projection, so each frame block goes HBM->VMEM once and only [BF, n_mels]
leaves — the classic MXU trade (more FLOPs for far less HBM traffic).

Round-3 tuning (all measured on the chip, 256x3s windows @ 160 mels):
- DFT rows past the mel filterbank's support (fmax) are dropped — exact,
  2176 -> 1024 padded bins, and ~2x fewer matmul FLOPs;
- the DFT matrices and framed PCM are STORED bf16 (the MXU consumed bf16
  operands anyway; f32 storage just doubled the dominant HBM stream);
- BF=512 so each (frame-block, bin-chunk) matrix re-fetch is amortised.
Then the DIF-factored tree (-> 12.8) and in-kernel framing (-> 8.1).
Net: 41.7 ms -> 8.1 ms per 256 windows (XLA FFT path: 52 ms).

Numerics: bf16 MXU operands, f32 accumulation — ~1-2% relative on mel
magnitudes (~0.15 dB max on dB-scaled features). That is why this kernel is
a throughput knob (AAT_PALLAS=1 / AAT_FAST=1) rather than the default: the
XLA rFFT path keeps strict float parity with the reference. Interpret-mode
tests pin the math at the same bf16 contract; e2e result JSON measured
byte-identical on every fixture (dB + thresholds absorb the error).

Layout: grid (frame_blocks, bin_chunks); the output block is revisited
consecutively across the bin-chunk dim and accumulated in place (standard
Pallas accumulation pattern). DFT bins are zero-padded to a chunk multiple —
the padded rows carry zero mel weight so the result is exact.
"""

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audio_analysis_tpu.ops.windows import get_window_np
from audio_analysis_tpu.ops.mel import _mel_filterbank_np, _mel_filterbank_slaney_np

# Block sizes. The kernel is HBM-traffic-bound, not FLOP-bound (measured:
# explicit bf16 casts changed nothing — the MXU work was already bf16).
# Dominant traffic is the DFT matrices, re-fetched once per (frame-block,
# bin-chunk) pair: traffic ~ (NF/BF) * bins_p * n_fft * bytes. Hence the
# matrices and the framed PCM are STORED in bf16 (half the bytes; identical
# numerics — the MXU read them as bf16 anyway) and BF is as large as VMEM
# allows (fr 2 MB + wr/wi 2 MB + out blocks, double-buffered).
BF = 512  # frames per block
CB = 128  # DFT bins per chunk


@lru_cache(maxsize=8)
def _dft_mats(n_fft: int, window: str, bins_used: int):
    """Hann-folded real/imag DFT matrices [bins_padded, n_fft] (float32),
    built only for the first `bins_used` rFFT bins — the mel filterbank's
    support ends at fmax (bin fmax*n_fft/sr << n_fft/2 for the released
    configs), and bins with zero mel weight contribute nothing, so dropping
    them is exact and cuts the DFT matmul FLOPs ~2x (2176 -> 1024 padded
    bins at fmax=11 kHz / 48 kHz / 4096)."""
    bins_p = -(-bins_used // CB) * CB
    n = np.arange(n_fft)
    k = np.arange(bins_used)
    ang = 2.0 * np.pi * np.outer(k, n) / n_fft
    w = get_window_np(window, n_fft, periodic=True).astype(np.float64)
    wr = np.zeros((bins_p, n_fft), np.float32)
    wi = np.zeros((bins_p, n_fft), np.float32)
    wr[:bins_used] = (np.cos(ang) * w).astype(np.float32)
    wi[:bins_used] = (-np.sin(ang) * w).astype(np.float32)
    # bf16 storage: the MXU consumes bf16 operands either way; storing f32
    # just doubled the kernel's dominant HBM stream
    return wr.astype(jnp.bfloat16), wi.astype(jnp.bfloat16), bins_p


@lru_cache(maxsize=16)
def _fb_np(sr, n_mels, fmin, fmax, n_fft, break_freq, htk):
    if htk:
        return _mel_filterbank_np(float(sr), int(n_mels), float(fmin), float(fmax), int(n_fft), float(break_freq))
    return _mel_filterbank_slaney_np(float(sr), int(n_mels), float(fmin), float(fmax), int(n_fft))


def mel_support_bins(sr, n_mels, fmin, fmax, n_fft, break_freq, htk) -> int:
    """Number of leading rFFT bins carrying any mel weight (rest are zero)."""
    fb = _fb_np(sr, n_mels, fmin, fmax, n_fft, break_freq, htk)
    nz = np.nonzero(fb.any(axis=0))[0]
    return int(nz[-1]) + 1 if len(nz) else fb.shape[1]


@lru_cache(maxsize=16)
def _mel_mat(sr, n_mels, fmin, fmax, n_fft, break_freq, htk, bins_p):
    fb = _fb_np(sr, n_mels, fmin, fmax, n_fft, break_freq, htk)
    out = np.zeros((bins_p, fb.shape[0]), np.float32)
    cols = min(bins_p, fb.shape[1])
    out[:cols] = fb.T[:cols]  # [bins_p, n_mels]
    return out


def _kernel(fr_ref, wr_ref, wi_ref, mel_ref, out_ref, *, power):
    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # bf16 operands in, f32 accumulation out — the kernel's documented
    # numerics contract (~1% relative). Inputs arrive already stored bf16.
    x = fr_ref[:]  # [BF, n_fft] bf16
    contract = (((1,), (1,)), ((), ()))
    r = jax.lax.dot_general(
        x, wr_ref[:], contract, preferred_element_type=jnp.float32
    )
    im = jax.lax.dot_general(
        x, wi_ref[:], contract, preferred_element_type=jnp.float32
    )
    p = r * r + im * im  # |rfft|^2
    if power == 1.0:
        p = jnp.sqrt(p)
    elif power != 2.0:
        p = jnp.power(p, power / 2.0)
    out_ref[:] += jax.lax.dot_general(
        p.astype(jnp.bfloat16),
        mel_ref[:].astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


# ---------------------------------------------------------------------------
# DIF-factored kernel (the default): a decimation-in-frequency tree of
# adaptive depth (3-5 levels, see _dif_levels) cuts the DFT matmul FLOPs
# 4-8x vs the direct-DFT kernel above while keeping every matmul MXU-shaped.
#
# DIF split (classic): DFT_N(x)[2k] = DFT_{N/2}(x[n]+x[n+N/2])[k] and
# DFT_N(x)[2k+1] = DFT_{N/2}((x[n]-x[n+N/2])*e^{-2pi i n/N})[k]. Applied
# L times, a frame becomes 2^L leaf sequences of length N/2^L; leaf b holds
# exactly the bins k = 2^L*j + off_b (off = the bit-reversal permutation —
# validated to 1e-13 against np.fft for L in 3..5 in the numpy prototype
# behind the tests). The depth deepens past 3 only while it still shrinks
# the padded leaf width (the 128-lane floor): full-spectrum n_fft=4096 runs
# L=4 (16x[256,128] — half the FLOPs of 8x[512,256]), the mel kernels stay
# at L=3 when their support already fits one lane tile per leaf.
# The branch prep (adds + twiddle rotations) is cheap f32 VPU work that
# scales as N*levels; the leaf DFTs are 4 real matmuls [BF, N/8] @ [N/8, BL]
# per leaf = 4*N*B/8 MACs/frame vs the direct kernel's 2*N*B — 4x fewer,
# with K=512, M=BF, N=128 all tile-aligned. Each leaf's power feeds its own
# row-slice of a leaf-permuted mel matrix, so no bin reordering ever happens.
# Traffic also drops: the frames stream is read ONCE (single grid dim) vs
# once per bin chunk, and the constants are ~300 KB vs 17 MB of DFT matrix.
# Measured on the chip (256x3s windows @ 160 mels, hop 640): 16.0 -> 13.0 ms
# end to end. Why the 4x MXU-FLOP cut lands as only 1.25x: a kernel-only
# diagnostic (frames pre-materialised, variants full/matmuls-only/tree-only)
# timed 6.7/5.9/6.0 ms — the in-kernel work is balanced, and ~6.3 ms of the
# 13 ms is the XLA-side frame materialisation (the [n_frames, n_fft] array
# is 6.4x the PCM bytes, written + re-read through HBM). The next lever is
# framing inside the kernel, not a cheaper tree.
# ---------------------------------------------------------------------------

# The framed DIF core holds one window's frame matrix (plus the live tree
# levels) in VMEM: ~10 MB of f32 at ~230 frames/window. Windows longer than
# this cap (in frames) fall back to the direct kernel, which blocks frames
# freely because it takes them pre-materialised.
MAX_FRAMES_PER_WINDOW = 320


def _dif_levels(n_fft: int, bins_used: int) -> int:
    """DIF tree depth for this shape: start at the base 3 levels (8 leaves)
    and deepen while another level still shrinks the padded leaf width bl
    (i.e. bins-per-leaf is above the 128-lane floor) and the shape allows it
    (n_fft divisible, leaf length kept >= 128 so the leaf matmul K dim stays
    MXU-efficient). Each extra level HALVES the leaf-matmul FLOPs until bl
    bottoms out: full-spectrum n_fft=4096 goes 8x[512,256] -> 16x[256,128]
    (2x), and the end-scan's 1101-bin support at n_fft=4800 stops padding
    138 bins up to a 256 tile."""
    L = 3
    while (
        -(-bins_used // (1 << L)) > 128
        and n_fft % (1 << (L + 1)) == 0
        and (n_fft >> (L + 1)) >= 128
    ):
        L += 1
    return L


def _leaf_off(levels: int) -> tuple:
    """Residue class of each leaf in tree-emit order (sum branch first at
    every level): leaf b covers final bins 2^levels * j + off[b]. This is
    the bit-reversal permutation — validated against np.fft for levels 3-5
    in the numpy prototype behind the tests."""
    return tuple(
        int(format(b, f"0{levels}b")[::-1], 2) for b in range(1 << levels)
    )


@lru_cache(maxsize=8)
def _dif_consts(
    n_fft: int, window: str, bins_used: int, exact: bool = False, levels: int = 3
):
    """Constants for the DIF kernel: window row, per-level twiddle pairs
    (a tuple of ``levels`` arrays), leaf DFT matrices (bf16; split-packed
    f32 when ``exact``), and the padded leaf width bl."""
    n_leaves = 1 << levels
    m_leaf = n_fft // n_leaves
    nb = -(-bins_used // n_leaves)  # bins per leaf
    bl = max(128, -(-nb // 128) * 128)  # padded to a lane tile
    w = get_window_np(window, n_fft, periodic=True).astype(np.float32)[None, :]

    def tw(m, nl):
        n = np.arange(m)
        return np.stack(
            [np.cos(2 * np.pi * n / nl), np.sin(2 * np.pi * n / nl)]
        ).astype(np.float32)

    tws = tuple(
        tw(n_fft >> (l + 1), n_fft >> l) for l in range(levels)
    )
    n = np.arange(m_leaf)
    j = np.arange(bl)
    ang = 2.0 * np.pi * np.outer(n, j) / m_leaf
    if exact:
        # n-way bf16 split stacks, packed [n, m_leaf, bl]: operand =
        # sum(parts) with each residual 2^-9 of the previous — the kernel's
        # split matmuls recover ~f32 products from bf16 MXU passes
        n_split = 2 if int(exact) == 1 else 3
        leaf_c = _split_pack(np.cos(ang).astype(np.float32), n_split)
        leaf_s = _split_pack(np.sin(ang).astype(np.float32), n_split)
    else:
        leaf_c = np.cos(ang).astype(jnp.bfloat16)
        leaf_s = np.sin(ang).astype(jnp.bfloat16)
    return w, tws, leaf_c, leaf_s, bl


def _split_pack(a: np.ndarray, n: int = 2) -> np.ndarray:
    """f32 [K, N] -> bf16 [n, K, N] residual split: a ~= sum_i parts[i] with
    |a - sum| <= 2^-9n |a| — the representation error of the split-matmul
    scheme."""
    parts, rem = [], a.astype(np.float32)
    for _ in range(n):
        hi = rem.astype(jnp.bfloat16)
        parts.append(hi)
        rem = rem - hi.astype(np.float32)
    return np.stack(parts)


@lru_cache(maxsize=16)
def _mel_mat_dif(
    sr, n_mels, fmin, fmax, n_fft, break_freq, htk, bl, exact=False, levels=3
):
    """[n_leaves*bl, n_mels] leaf-permuted mel matrix: row (b, j) carries
    the mel weights of bin 2^levels*j + off[b] (zero rows past the
    support)."""
    fb = _fb_np(sr, n_mels, fmin, fmax, n_fft, break_freq, htk)  # [m, bins]
    n_leaves = 1 << levels
    out = np.zeros((n_leaves * bl, fb.shape[0]), np.float32)
    for b, off in enumerate(_leaf_off(levels)):
        k = off + n_leaves * np.arange(bl)
        valid = k < fb.shape[1]
        out[b * bl : b * bl + int(valid.sum())] = fb.T[k[valid]]
    if exact:
        return _split_pack(out, 2 if int(exact) == 1 else 3)
    return out.astype(jnp.bfloat16)


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _out_rows(fp, row0, keep):
    """Validated output row count for the row0/keep margin-slice contract
    (shared by both DIF cores — the checks MUST stay in sync): keep is a
    sublane multiple fitting fp, and row0 requires keep (alone it would
    shift the output and roll-wrap the tail frames)."""
    if keep is None:
        if row0:
            raise ValueError("row0 (frame0) requires keep (frames)")
        return fp
    out_rows = int(keep)
    if out_rows % 8 or row0 + out_rows > fp:
        raise ValueError(f"keep must be a sublane multiple within fp: {keep}")
    return out_rows


def _frame_in_kernel(z_ref, w_ref, *, n_fft, k, fp, row0=0):
    """Framing happens HERE, in VMEM: the input block is one window's padded
    PCM as [rows, hop] (1x the PCM bytes through HBM); frame f is rows
    f..f+k-1 flattened, so the frame matrix is k sublane-shifted slabs
    concatenated along lanes. An XLA-side frame materialisation writes +
    re-reads a [n_frames, n_fft] array at 6.4x the PCM bytes — measured
    ~6.3 of 13 ms end-to-end on the mel kernel. ``row0`` skips leading
    frames entirely (the mag kernel's slab margin — frames a slab computes
    only to discard pay full leaf-matmul FLOPs otherwise)."""
    z = z_ref[0].astype(jnp.float32)  # [rows_p, hop]
    # roll-to-offset-0 before slicing: Mosaic cannot concatenate vectors
    # whose sublane offsets differ, and z[i:i+fp] carries offset i mod 8
    slabs = [
        (jnp.roll(z, -(row0 + i), axis=0) if row0 + i else z)[:fp, :]
        for i in range(k)
    ]
    x = jnp.concatenate(slabs, axis=1)
    # window applied here too: an XLA-side multiply would force a separate
    # f32 round-trip through HBM (measured: 13 -> 22 ms on the frames form)
    return x[:, :n_fft] * w_ref[:]


def _dif_tree(x, tw_refs, n_fft):
    """len(tw_refs)-level DIF butterfly over the windowed frame matrix:
    returns the 2^levels leaf sequences [(real, imag-or-None), ...] in
    tree-emit order (leaf b holds final bins 2^levels*j + _leaf_off[b]).
    All f32 VPU work — exact."""

    def split_c(r, i, q, c, s):
        """Complex branch (r, i) of length 2q -> (sum branch, twiddled diff)."""
        sr, si = r[:, :q] + r[:, q:], i[:, :q] + i[:, q:]
        dr, di = r[:, :q] - r[:, q:], i[:, :q] - i[:, q:]
        return (sr, si), (dr * c + di * s, di * c - dr * s)

    def split_r(r, q, c, s):
        """Real branch -> (real sum branch, complex twiddled diff)."""
        return (r[:, :q] + r[:, q:], None), (
            (r[:, :q] - r[:, q:]) * c,
            (r[:, q:] - r[:, :q]) * s,  # -(d * s) without a negate pass
        )

    branches = [(x, None)]
    q = n_fft // 2
    for tw in tw_refs:
        c, s = tw[0:1, :], tw[1:2, :]
        nxt = []
        for r, i in branches:
            nxt.extend(split_r(r, q, c, s) if i is None else split_c(r, i, q, c, s))
        branches = nxt
        q //= 2
    return branches


def _bf16_hi(a):
    """The f32 value of round-to-nearest-even(a -> bf16), computed with
    integer bit math instead of a convert pair: XLA-CPU's algebraic
    simplifier cancels convert_f32(convert_bf16(x)) back to x (measured —
    the residual `a - bf16(a)` folds to zero under jit on CPU, silently
    degrading the split to a single bf16 pass in interpret-mode tests),
    and the bit form gives it nothing to cancel. Finite values only (audio
    magnitudes; NaN/Inf never reach the split)."""
    b = jax.lax.bitcast_convert_type(a, jnp.uint32)
    r = b + jnp.uint32(0x7FFF) + ((b >> jnp.uint32(16)) & jnp.uint32(1))
    return jax.lax.bitcast_convert_type(r & jnp.uint32(0xFFFF0000), jnp.float32)


def _exact_machinery(n, use_bits=False):
    """(split, dotx) for n-way split-bf16 matmuls: f32-accurate dots from
    bf16 MXU passes — see the `exact` notes on _kernel_dif.

    ``use_bits`` selects the integer-bit residual extraction — required
    under interpret (XLA-CPU cancels the convert pair, see _bf16_hi) but
    heavier on the kernel's scoped VMEM stack, so compiled Mosaic keeps the
    convert form (Mosaic preserves it: the on-chip split accuracy ladder is
    measured at 1.5e-6 vs a float64 oracle, tools/verify_frontend_precision.py
    re-proves it any time)."""
    f32, bf16 = jnp.float32, jnp.bfloat16

    def split(a):
        parts, rem = [], a
        for _ in range(n - 1):
            if use_bits:
                hi = _bf16_hi(rem)
                parts.append(hi.astype(bf16))  # exact: hi is representable
                rem = rem - hi
            else:
                hi = rem.astype(bf16)
                parts.append(hi)
                rem = rem - hi.astype(f32)
        parts.append(rem.astype(bf16))
        return parts

    # term order (i, j) with i+j < n, largest i+j first (sum smallest-first)
    order = sorted(
        ((i, j) for i in range(n) for j in range(n) if i + j < n),
        key=lambda t: -(t[0] + t[1]),
    )

    def dotx(parts, b_ref, row0=0, row1=None):
        acc = None
        for i, j in order:
            bj = b_ref[j] if row1 is None else b_ref[j, row0:row1, :]
            t = _dot(parts[i], bj)
            acc = t if acc is None else acc + t
        return acc

    return split, dotx


def _kernel_dif(
    z_ref, w_ref, *refs,
    power, n_fft, hop, k, bl, n_mels, levels=3, exact=False, use_bits=False,
    row0=0,
):
    tw_refs, (c_ref, s_ref, mel_ref, out_ref) = refs[:levels], refs[levels:]
    f32 = jnp.float32
    fp = out_ref.shape[0]
    x = _frame_in_kernel(z_ref, w_ref, n_fft=n_fft, k=k, fp=fp, row0=row0)
    leaves = _dif_tree(x, tw_refs, n_fft)

    bf16 = jnp.bfloat16
    if exact:
        # f32-accurate matmuls from bf16 MXU passes: operands split into n
        # bf16 residual parts (constants pre-split on host, activations
        # split here) and the cross products with i+j < n are summed
        # smallest-first — representation error ~2^-9n relative. Explicit
        # because Mosaic ignores lax.Precision on f32 dots (measured 6e-3
        # max rel = one bf16 pass). bf16*bf16 -> f32 products are exact.
        n = c_ref.shape[0]
        split, dotx = _exact_machinery(n, use_bits)

        def dot_cs(a):
            parts = split(a)
            return dotx(parts, c_ref), dotx(parts, s_ref)

        acc = jnp.zeros(out_ref.shape, f32)
        for b, (r, i) in enumerate(leaves):
            rc, rs = dot_cs(r)
            if i is None:
                xr, xi = rc, -rs
            else:
                ic, is_ = dot_cs(i)
                xr, xi = rc + is_, ic - rs
            p = xr * xr + xi * xi
            if power == 1.0:
                p = jnp.sqrt(p)
            elif power != 2.0:
                p = jnp.power(p, power / 2.0)
            acc = acc + dotx(split(p), mel_ref, b * bl, (b + 1) * bl)
        out_ref[:] = acc
        return

    C, S = c_ref[:], s_ref[:]
    acc = jnp.zeros(out_ref.shape, f32)
    for b, (r, i) in enumerate(leaves):
        rb = r.astype(bf16)
        if i is None:
            xr, xi = _dot(rb, C), -_dot(rb, S)
        else:
            ib = i.astype(bf16)
            xr = _dot(rb, C) + _dot(ib, S)
            xi = _dot(ib, C) - _dot(rb, S)
        p = xr * xr + xi * xi
        if power == 1.0:
            p = jnp.sqrt(p)
        elif power != 2.0:
            p = jnp.power(p, power / 2.0)
        acc = acc + _dot(p.astype(bf16), mel_ref[b * bl : (b + 1) * bl, :])
    out_ref[:] = acc


def _kernel_dif_mag(
    z_ref, w_ref, *refs,
    power, n_fft, k, bl, levels=3, exact=0, use_bits=False, row0=0, nyq=False,
):
    """Magnitude-spectrum variant of _kernel_dif: same in-VMEM framing and
    DIF tree, but each leaf's |X|^power is written straight to its own
    lane-slice of the output (leaf-permuted [fp, n_leaves*bl] layout — see
    leaf_bin_index for the natural-order gather) instead of feeding a mel
    matmul. Serves consumers that need the full linear spectrum (the detect
    program's median thresholds, reference src/identify_tracks.py:650-656).

    ``row0`` starts framing at that slab frame (the hop-aligned margin —
    margin frames are pure discard, so they never touch the MXU), and
    ``nyq`` means the leaf matrices stop one bin short of Nyquist (bl is a
    clean lane multiple instead of one-bin-over): bin n_fft/2 lives on leaf
    0 at j = m_leaf/2 where the DFT column is cos(pi*n) = (-1)^n exactly,
    so an f32 VPU alternating-sum reconstitutes it — written to lane 0 of
    a trailing 128-wide chunk."""
    tw_refs, (c_ref, s_ref, out_ref) = refs[:levels], refs[levels:]
    fp = out_ref.shape[0]
    x = _frame_in_kernel(z_ref, w_ref, n_fft=n_fft, k=k, fp=fp, row0=row0)
    leaves = _dif_tree(x, tw_refs, n_fft)

    def epilogue(p):
        if power == 1.0:
            return jnp.sqrt(p)
        if power != 2.0:
            return jnp.power(p, power / 2.0)
        return p

    if exact:
        n = c_ref.shape[0]
        split, dotx = _exact_machinery(n, use_bits)
        for b, (r, i) in enumerate(leaves):
            pr = split(r)
            rc, rs = dotx(pr, c_ref), dotx(pr, s_ref)
            if i is None:
                xr, xi = rc, -rs
            else:
                pi = split(i)
                xr = rc + dotx(pi, s_ref)
                xi = dotx(pi, c_ref) - rs
            out_ref[:, b * bl : (b + 1) * bl] = epilogue(xr * xr + xi * xi)
    else:
        bf16 = jnp.bfloat16
        C, S = c_ref[:], s_ref[:]
        for b, (r, i) in enumerate(leaves):
            rb = r.astype(bf16)
            if i is None:
                xr, xi = _dot(rb, C), -_dot(rb, S)
            else:
                ib = i.astype(bf16)
                xr = _dot(rb, C) + _dot(ib, S)
                xi = _dot(ib, C) - _dot(rb, S)
            out_ref[:, b * bl : (b + 1) * bl] = epilogue(xr * xr + xi * xi)

    if nyq:
        # X[n_fft/2] = DFT_m(leaf0)[m/2] = sum_n leaf0[n] * (-1)^n — leaf
        # 0 is the all-real sum branch (tree level sums are exact f32), so
        # this column is MORE accurate than the split-matmul bins
        m_leaf = n_fft >> levels
        r0 = leaves[0][0]  # [fp, m_leaf] f32
        sign = jnp.where(
            (jax.lax.broadcasted_iota(jnp.int32, (1, m_leaf), 1) & 1) == 0,
            jnp.float32(1.0), jnp.float32(-1.0),
        )
        t = r0 * sign
        # pairwise-fold to one lane tile before the reduce: the plain lane
        # sum's sequential f32 error on this alternating (cancelling) sum
        # measured 8.7e-5 vs a f64 oracle — worse than the split-matmul
        # bins; folding matches the FFT's own log-depth error growth
        while t.shape[1] > 128:
            h2 = t.shape[1] // 2
            t = t[:, :h2] + t[:, h2:]
        v = jnp.sum(t, axis=1, keepdims=True)  # [fp, 1], xi = 0
        nb_cols = (1 << levels) * bl
        lane = jax.lax.broadcasted_iota(jnp.int32, (fp, 128), 1)
        out_ref[:, nb_cols : nb_cols + 128] = jnp.where(
            lane == 0, epilogue(v * v), jnp.float32(0.0)
        )


def z_layout_shapes(n_fft: int, hop_length: int, n_samples: int):
    """(rows_p, fp, k) of the framed-DIF kernel's [rows_p, hop] input for
    windows of ``n_samples``: k = ceil(n_fft/hop) slabs per frame, fp frames
    padded to the sublane multiple, rows_p = fp + k."""
    f = 1 + n_samples // hop_length
    k = -(-n_fft // hop_length)
    fp = -(-f // 8) * 8
    return fp + k, fp, k


def z_layout(n_fft: int, hop_length: int, n_samples: int):
    """The framed-DIF input layout a caller must build to feed
    ``pallas_mel_spectrogram(..., windows_is_z=True)``: each row is
    ``n_fft//2`` zeros | the (masked, normalised) window | zeros, flat
    [rows_p * hop] — i.e. the kernel's [rows_p, hop] block in row-major
    order, so a gather can emit it directly and skip the separate pad +
    cast + reshape pass entirely. Returns (rows_p, fp, k, z_len), or None
    when the framed path would not be taken for these statics (caller must
    then feed plain [N, n_samples] windows)."""
    f = 1 + n_samples // hop_length
    if not _use_dif(int(n_fft)) or f > MAX_FRAMES_PER_WINDOW:
        return None
    rows_p, fp, k = z_layout_shapes(int(n_fft), int(hop_length), int(n_samples))
    return rows_p, fp, k, rows_p * int(hop_length)


@partial(
    jax.jit,
    static_argnames=(
        "hop_length", "n_fft", "power", "n_samples", "interpret", "exact",
        "row0", "keep",
    ),
)
def _melspec_core_dif(
    windows, w, tws, leaf_c, leaf_s, meld, *, hop_length, n_fft, power,
    n_samples=None, interpret=False, exact=False, row0=0, keep=None,
):
    levels = len(tws)  # tree depth is carried by the constants themselves
    n = windows.shape[0]
    s = int(n_samples) if n_samples is not None else windows.shape[1]
    f = 1 + s // hop_length
    rows_p, fp, k = z_layout_shapes(n_fft, hop_length, s)
    # One window per grid step: the padded PCM lands in HBM as [rows, hop]
    # bf16 (1x the PCM bytes — the bf16 rounding of the PCM is the kernel's
    # existing numerics contract) and the 6.4x-amplified frame matrix only
    # ever exists in VMEM, assembled by the kernel.
    z_dtype = jnp.float32 if exact else jnp.bfloat16
    if n_samples is not None:
        # caller pre-built the z layout (pad n_fft//2 | window | zero tail),
        # usually emitting it straight out of its own gather — the reshape
        # below splits the trailing dim in row-major order, i.e. it is free
        if windows.shape[1] != rows_p * hop_length:
            raise ValueError(
                f"windows_is_z: expected {rows_p * hop_length} samples/row, "
                f"got {windows.shape[1]}"
            )
        z = windows.astype(z_dtype).reshape(n, rows_p, hop_length)
    else:
        z = jnp.pad(
            windows, ((0, 0), (n_fft // 2, rows_p * hop_length - s - n_fft // 2))
        ).astype(z_dtype).reshape(n, rows_p, hop_length)

    bl = leaf_c.shape[-1]
    n_mels = meld.shape[-1]
    out_rows = _out_rows(fp, row0, keep)
    full = lambda arr: pl.BlockSpec(
        arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        partial(
            _kernel_dif,
            power=power, n_fft=n_fft, hop=hop_length, k=k, bl=bl, n_mels=n_mels,
            levels=levels, exact=exact, use_bits=bool(interpret), row0=int(row0),
        ),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, rows_p, hop_length), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            full(w), *(full(t) for t in tws),
            full(leaf_c), full(leaf_s), full(meld),
        ],
        out_specs=pl.BlockSpec((out_rows, n_mels), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * out_rows, n_mels), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=(3 if exact else 1)
            * (
                4 * n * out_rows * n_fft * bl
                + 2 * n * out_rows * (1 << levels) * bl * n_mels
            ),
            bytes_accessed=n * rows_p * hop_length * (4 if exact else 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(z, w, *tws, leaf_c, leaf_s, meld)

    out = out.reshape(n, out_rows, n_mels)
    if keep is None:
        out = out[:, :f]
    return jnp.transpose(out, (0, 2, 1))


# device-resident weight cache: keyed by the static config; keeps the big
# DFT/mel matrices OUT of the jaxpr (84 MB constants would bloat every
# compile) and uploaded once per process
_DEVICE_WEIGHTS = {}


def _device_weights_dif(sr, n_fft, n_mels, fmin, fmax, break_freq, htk, window, exact=False):
    key = ("dif", sr, n_fft, n_mels, fmin, fmax, break_freq, htk, window, exact)
    got = _DEVICE_WEIGHTS.get(key)
    if got is None:
        bins_used = mel_support_bins(sr, n_mels, fmin, fmax, n_fft, break_freq, htk)
        levels = _dif_levels(n_fft, bins_used)
        w, tws, leaf_c, leaf_s, bl = _dif_consts(
            n_fft, window, bins_used, exact, levels
        )
        meld = _mel_mat_dif(
            sr, n_mels, fmin, fmax, n_fft, break_freq, htk, bl, exact, levels
        )
        with jax.ensure_compile_time_eval():
            got = (
                jnp.asarray(w),
                tuple(jnp.asarray(t) for t in tws),
                jnp.asarray(leaf_c), jnp.asarray(leaf_s), jnp.asarray(meld),
            )
        _DEVICE_WEIGHTS[key] = got
    return got


def _use_dif(n_fft: int) -> bool:
    """The DIF tree needs n_fft divisible by 8; AAT_PALLAS_ALG=matmul forces
    the direct-DFT kernel (A/B knob — read at trace time, so flip it only in
    a fresh process or before the first call for a given shape)."""
    import os

    if os.environ.get("AAT_PALLAS_ALG", "").strip().lower() == "matmul":
        return False
    return n_fft % 8 == 0 and n_fft >= 64


def _device_weights(sr, n_fft, n_mels, fmin, fmax, break_freq, htk, window):
    key = (sr, n_fft, n_mels, fmin, fmax, break_freq, htk, window)
    got = _DEVICE_WEIGHTS.get(key)
    if got is None:
        bins_used = mel_support_bins(sr, n_mels, fmin, fmax, n_fft, break_freq, htk)
        wr, wi, bins_p = _dft_mats(n_fft, window, bins_used)
        melm = _mel_mat(sr, n_mels, fmin, fmax, n_fft, break_freq, htk, bins_p)
        # the first call may happen INSIDE an outer trace (the fused classify
        # program with AAT_FAST): force concrete device arrays so the cache
        # never holds that trace's tracers (which would poison later calls)
        with jax.ensure_compile_time_eval():
            got = (jnp.asarray(wr), jnp.asarray(wi), jnp.asarray(melm), bins_p)
        _DEVICE_WEIGHTS[key] = got
    return got


@partial(jax.jit, static_argnames=("hop_length", "n_fft", "power", "interpret"))
def _melspec_core(windows, wr, wi, melm, *, hop_length, n_fft, power, interpret=False):
    from audio_analysis_tpu.ops.stft import frame

    n, s = windows.shape
    f = 1 + s // hop_length
    padded = jnp.pad(windows, ((0, 0), (n_fft // 2, n_fft // 2)))
    # bf16 framed PCM: the MXU rounds the operand to bf16 regardless; bf16
    # storage halves the [N*F, n_fft] stream (the array is ~6x redundant
    # already because n_fft >> hop)
    frames = (
        frame(padded, n_fft, hop_length).reshape(-1, n_fft).astype(jnp.bfloat16)
    )
    nf = frames.shape[0]
    nf_p = -(-nf // BF) * BF
    frames = jnp.pad(frames, ((0, nf_p - nf), (0, 0)))

    bins_p = wr.shape[0]
    n_mels = melm.shape[1]
    n_chunks = bins_p // CB

    out = pl.pallas_call(
        partial(_kernel, power=power),
        grid=(nf_p // BF, n_chunks),
        in_specs=[
            pl.BlockSpec((BF, n_fft), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CB, n_fft), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CB, n_fft), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CB, n_mels), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BF, n_mels), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nf_p, n_mels), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * nf_p * bins_p * n_fft * 2 + 2 * nf_p * bins_p * n_mels,
            bytes_accessed=(nf_p // BF) * bins_p * n_fft * 4 + nf_p * n_fft * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(frames, wr, wi, melm)

    out = out[:nf].reshape(n, f, n_mels)
    return jnp.transpose(out, (0, 2, 1))


def pallas_mel_spectrogram(
    windows: jnp.ndarray,
    *,
    sr: int,
    n_fft: int,
    hop_length: int,
    n_mels: int,
    fmin: float,
    fmax: float,
    break_freq: float = 1750.0,
    power: float = 2.0,
    htk: bool = True,
    window: str = "hann",
    windows_is_z: bool = False,
    n_samples: int = None,
    interpret: bool = False,
    exact: bool = False,
    frame0: int = 0,
    frames: int = None,
) -> jnp.ndarray:
    """[N, S] PCM windows -> [N, n_mels, F] mel spectrograms
    (librosa STFT conventions: centre/constant padding).

    ``frame0``/``frames``: emit only kernel frames [frame0, frame0+frames)
    — the caller's margin slice done BEFORE the leaf matmuls (margin frames
    never touch the MXU). ``frames`` must be a sublane multiple that fits
    the padded frame count; framed-DIF path only.

    ``windows_is_z=True``: the input is already in the framed-DIF kernel's
    flat z layout (see ``z_layout``; requires ``n_samples`` for the true
    window length) — the pad/cast/reshape pass is skipped entirely.

    ``exact`` (0/1/2): split-bf16 matmuls — every operand is decomposed into
    ``exact+1`` bf16 residual parts and the cross products recombined in
    f32, recovering near-f32 dots from bf16 MXU passes (Mosaic runs plain
    f32 dots as ONE bf16 pass regardless of lax.Precision — measured).
    Measured on chip vs a float64 oracle (256 3s windows, n_fft 4096):
    exact=1 4.8e-5 max rel @6.9 ms, exact=2 1.5e-6 @11.4 ms — vs the XLA
    FFT+einsum path's 5.2e-3 @43.3 ms (XLA's own mel einsum is a single
    bf16 pass) and this kernel's fast contract at 2.6e-2 @3.2 ms. Input z
    storage is f32 in exact mode (bf16-rounded input IS most of fast's
    error). DIF path only."""
    if windows_is_z:
        if n_samples is None or z_layout(int(n_fft), int(hop_length), int(n_samples)) is None:
            raise ValueError(
                "windows_is_z requires n_samples and a framed-DIF-eligible "
                "(n_fft, hop, length) combination — gate on z_layout(...)"
            )
        consts = _device_weights_dif(
            int(sr), int(n_fft), int(n_mels), float(fmin), float(fmax), float(break_freq), bool(htk), window,
            exact=int(exact),
        )
        return _melspec_core_dif(
            windows, *consts,
            hop_length=int(hop_length), n_fft=int(n_fft), power=float(power),
            n_samples=int(n_samples), interpret=interpret, exact=int(exact),
            row0=int(frame0), keep=None if frames is None else int(frames),
        )
    f = 1 + windows.shape[-1] // int(hop_length)
    if _use_dif(int(n_fft)) and f <= MAX_FRAMES_PER_WINDOW:
        consts = _device_weights_dif(
            int(sr), int(n_fft), int(n_mels), float(fmin), float(fmax), float(break_freq), bool(htk), window,
            exact=int(exact),
        )
        return _melspec_core_dif(
            windows, *consts,
            hop_length=int(hop_length), n_fft=int(n_fft), power=float(power),
            interpret=interpret, exact=int(exact),
            row0=int(frame0), keep=None if frames is None else int(frames),
        )
    if frames is not None or frame0:
        raise ValueError("frame0/frames requires the framed-DIF kernel")
    if exact:
        raise ValueError(
            "exact=True requires the framed-DIF kernel (n_fft % 8 == 0 and "
            f"<= {MAX_FRAMES_PER_WINDOW} frames/window) — use the XLA FFT "
            "path for this shape instead"
        )
    wr, wi, melm, _ = _device_weights(
        int(sr), int(n_fft), int(n_mels), float(fmin), float(fmax), float(break_freq), bool(htk), window
    )
    return _melspec_core(
        windows, wr, wi, melm,
        hop_length=int(hop_length), n_fft=int(n_fft), power=float(power),
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# Full magnitude spectrogram of LONG signals through the framed-DIF kernel.
#
# The detect program's STFT (n_fft 4096, hop 281, 60 s recordings) was the
# largest remaining leg of the fused detect batch (~78 ms of 170 ms): XLA's
# path materialises the 6.4x-amplified [n_frames, n_fft] frame matrix in HBM
# before its FFT. Here the recording is sliced into hop-aligned overlapping
# slabs (same scheme as the end-scan in detect/signal_noise) and each slab
# runs the in-VMEM-framing DIF kernel, emitting |X|^power for ALL rfft bins
# in the leaf-permuted layout; a single gather restores natural bin order.
# ---------------------------------------------------------------------------


def leaf_bin_index(
    n_fft: int, bl: int, nyq: bool = False, levels: int = 3
) -> np.ndarray:
    """Column index into the [., n_leaves*bl] leaf-permuted layout for each
    natural rfft bin k: leaf b = off^-1(k mod n_leaves), column b*bl +
    k//n_leaves. With ``nyq`` (the Nyquist-special layout, see _mag_layout)
    bin n_fft/2 instead maps to lane 0 of the trailing 128-wide chunk."""
    n_leaves = 1 << levels
    inv = {off: b for b, off in enumerate(_leaf_off(levels))}
    k = np.arange(1 + n_fft // 2)
    idx = (
        np.vectorize(inv.get)(k % n_leaves) * bl + k // n_leaves
    ).astype(np.int32)
    if nyq:
        idx[-1] = n_leaves * bl
    return idx


def _mag_layout(n_fft: int):
    """(bins, levels, nyq) of the mag kernel's full-spectrum leaf layout.

    Drop the Nyquist bin from the leaf matrices whenever the remaining
    n_fft/2 bins then tile the leaves EXACTLY (bins-per-leaf a lane
    multiple) — otherwise its one extra column on leaf 0 pads bl a full
    128 lanes up (384 instead of 256 at n_fft=4096 with the base 3-level
    tree: +50% matmul FLOPs for one real column). The dropped bin is
    reconstituted in-kernel by an exact alternating sum."""
    full_bins = 1 + n_fft // 2
    bins = n_fft // 2
    levels = _dif_levels(n_fft, bins)
    nyq = bins % (1 << levels) == 0 and (bins >> levels) % 128 == 0
    if not nyq:
        bins = full_bins
        levels = _dif_levels(n_fft, bins)
    return bins, levels, nyq


def _nyq_special(n_fft: int) -> bool:
    return _mag_layout(n_fft)[2]


def _device_weights_dif_mag(n_fft, window, exact=0):
    key = ("difmag", n_fft, window, int(exact))
    got = _DEVICE_WEIGHTS.get(key)
    if got is None:
        bins, levels, _nyq = _mag_layout(n_fft)
        w, tws, leaf_c, leaf_s, bl = _dif_consts(
            n_fft, window, bins, int(exact), levels
        )
        with jax.ensure_compile_time_eval():
            got = (
                jnp.asarray(w),
                tuple(jnp.asarray(t) for t in tws),
                jnp.asarray(leaf_c), jnp.asarray(leaf_s),
            )
        _DEVICE_WEIGHTS[key] = got
    return got


def mag_chunk_frames(n_fft: int, hop_length: int) -> int:
    """Frames contributed per slab. Smaller than the mel kernel's cap: the
    mag kernel's live VMEM set adds the [fp, 8*bl] f32 output block (~2 MB
    at 184 frames) on top of the frame matrix + tree (~3x frames bytes), so
    the slab is sized to keep the whole kernel under ~12 MB of the ~16 MB
    VMEM. AAT_MAG_CHUNK overrides for on-chip tuning."""
    import os

    v = os.environ.get("AAT_MAG_CHUNK")
    if v:
        # round DOWN to a sublane multiple (the kernel's out block): the
        # knob is tuned against the VMEM ceiling, so rounding up could push
        # a near-limit value over the compile cliff
        return max(8, int(v) // 8 * 8)
    return 160


def mag_geometry(n_fft: int, hop_length: int):
    """Static slab geometry for pallas_stft_magnitude, or None when the
    framed-DIF kernel cannot take this (n_fft, hop) combination."""
    if not _use_dif(int(n_fft)):
        return None
    m = -(-(n_fft // 2) // hop_length)  # hop-aligned left margin, frames
    c = mag_chunk_frames(n_fft, hop_length)
    s = (m + c - 1) * hop_length + n_fft // 2
    f_kernel = 1 + s // hop_length
    if f_kernel > MAX_FRAMES_PER_WINDOW:
        return None
    return dict(m=m, c=c, s=s, f_kernel=f_kernel)


@partial(
    jax.jit,
    static_argnames=(
        "hop_length", "n_fft", "power", "interpret", "exact", "row0", "keep",
        "nyq",
    ),
)
def _magspec_core_dif(
    windows, w, tws, leaf_c, leaf_s,
    *, hop_length, n_fft, power, interpret=False, exact=0,
    row0=0, keep=None, nyq=False,
):
    """[N, S] PCM windows -> leaf-permuted |X|^power (f32): [N, f, cols]
    (frames 0..f), or [N, keep, cols] when ``keep`` is set — the kernel
    frames/computes ONLY slab frames [row0, row0+keep) (the caller's margin
    slice, done before the leaf matmuls instead of after the kernel)."""
    levels = len(tws)
    n, s = windows.shape
    f = 1 + s // hop_length
    rows_p, fp, k = z_layout_shapes(n_fft, hop_length, s)
    z_dtype = jnp.float32 if exact else jnp.bfloat16
    z = jnp.pad(
        windows, ((0, 0), (n_fft // 2, rows_p * hop_length - s - n_fft // 2))
    ).astype(z_dtype).reshape(n, rows_p, hop_length)

    bl = leaf_c.shape[-1]
    cols = (1 << levels) * bl + (128 if nyq else 0)
    out_rows = _out_rows(fp, row0, keep)
    full = lambda arr: pl.BlockSpec(
        arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        partial(
            _kernel_dif_mag,
            power=power, n_fft=n_fft, k=k, bl=bl, levels=levels, exact=exact,
            use_bits=bool(interpret), row0=int(row0), nyq=nyq,
        ),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, rows_p, hop_length), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            full(w), *(full(t) for t in tws),
            full(leaf_c), full(leaf_s),
        ],
        out_specs=pl.BlockSpec((out_rows, cols), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * out_rows, cols), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=(3 if int(exact) == 2 else (2 if exact else 1))
            * 4 * n * out_rows * n_fft * bl,
            bytes_accessed=n * rows_p * hop_length * (4 if exact else 2)
            + n * out_rows * cols * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(z, w, *tws, leaf_c, leaf_s)
    out = out.reshape(n, out_rows, cols)
    return out if keep is not None else out[:, :f]


def gather_slabs(y, *, hop_length, n_windows, c, m, s):
    """Hop-aligned slab gather shared by the mag and end-scan paths (same
    trick as ops.stft.frame — an explicit [C, S] index gather takes XLA-TPU
    minutes to compile): slabs start every ``c*hop`` samples, shifted ``m``
    frames early so kernel frame ``m+i`` of slab ``w`` IS global frame
    ``w*c+i`` (the global centre pad = the lead zeros; kernel frames < m
    land in each slab's own zero pad and are dropped in-kernel via the
    row0/keep margin contract). [b, t] -> [b*n_windows, s]."""
    b, t = y.shape
    stride = c * hop_length
    kk = -(-s // stride)
    lead = m * hop_length
    total = (n_windows + kk) * stride
    padded = jnp.pad(y, ((0, 0), (lead, max(0, total - lead - t))))
    zz = padded[:, :total].reshape(b, n_windows + kk, stride)
    return jnp.concatenate(
        [zz[:, i : i + n_windows, :] for i in range(kk)], axis=-1
    )[..., :s].reshape(b * n_windows, s)


def pallas_stft_magnitude(
    y: jnp.ndarray,
    *,
    n_fft: int,
    hop_length: int,
    window: str = "hann",
    power: float = 1.0,
    exact: int = 2,
    interpret: bool = False,
):
    """[B, T] PCM -> [B, 1 + n_fft//2, 1 + T//hop] |STFT|^power, float32,
    natural bin order (librosa centre/constant-pad conventions — pinned
    against ops.stft.stft_magnitude by test).

    Callers must gate on ``mag_geometry(n_fft, hop_length) is not None``.
    ``exact`` as in pallas_mel_spectrogram (split-bf16 leaf dots); detect
    uses exact>=1 so median-threshold decisions ride f32-grade magnitudes.
    """
    g = mag_geometry(int(n_fft), int(hop_length))
    if g is None:
        raise ValueError(
            "pallas_stft_magnitude: geometry not framed-DIF-eligible — gate "
            "on mag_geometry(...)"
        )
    b, t = y.shape
    n_frames = 1 + t // hop_length
    m, c, s = g["m"], g["c"], g["s"]
    n_slabs = -(-n_frames // c)
    win = gather_slabs(y, hop_length=hop_length, n_windows=n_slabs, c=c, m=m, s=s)

    consts = _device_weights_dif_mag(int(n_fft), window, int(exact))
    _bins, levels, nyq = _mag_layout(int(n_fft))
    out = _magspec_core_dif(
        win, *consts,
        hop_length=int(hop_length), n_fft=int(n_fft), power=float(power),
        interpret=interpret, exact=int(exact), row0=m, keep=c, nyq=nyq,
    )  # [b*n_slabs, c, cols] — margin already dropped in-kernel
    bl = consts[-1].shape[-1]
    out = out.reshape(b, n_slabs * c, -1)[:, :n_frames]
    idx = jnp.asarray(leaf_bin_index(int(n_fft), bl, nyq, levels))
    spec = jnp.take(out, idx, axis=2)  # natural bin order
    return jnp.transpose(spec, (0, 2, 1))
