#!/usr/bin/env python3
"""Profile the flagship fused gather->frontend->EfficientNetB0->means program.

Attributes wall-time across the program's stages by timing each stage as its
own jitted program on the same shapes (the axon tunnel supports no on-device
trace viewer; dependent-scalar transfer forces execution, see bench._force),
then walks the EfficientNet stage prefixes (XLA DCE turns an intermediate
output into a true prefix program) to localise the conv cost.

  python tools/profile_flagship.py [--windows 256] [--stages] [--trace DIR]

Writes PROFILE_FLAGSHIP.json at the repo root and prints the table.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _force(x):
    import jax.numpy as jnp

    if isinstance(x, (list, tuple)):
        return sum(_force(v) for v in x)
    return float(np.asarray(jnp.sum(x.astype(jnp.float32))))


def _time(fn, args, reps=32, warm=2):
    # reps>=32: each measurement window carries a ~3.7 ms dispatch+sync
    # floor over the tunnel; at reps=8 it inflates per-call time ~25%
    for _ in range(warm):
        out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / reps


def _roofline(effnet_dir, model, feats3):
    """The evidence behind "~10-20 % MFU is XLA's practical ceiling on the
    reference's channel counts": a per-conv MXU cost model (channel dims pad
    to the TPU's 128-lane tiles, so true FLOPs / padded FLOPs bounds the
    achievable MFU independent of fusion quality) plus the compiled HLO's
    kernel inventory (how much XLA already fused — few kernels means little
    left for hand scheduling).

    Depthwise convs never touch the MXU (VPU work) — they are listed but
    excluded from the MXU utilisation bound."""
    import jax
    import jax.numpy as jnp
    import tensorflow as tf

    tfm = tf.keras.models.load_model(
        str(Path(effnet_dir) / "audioModel.keras"), compile=False
    )

    def pad(c, t=128):
        return -(-int(c) // t) * t

    convs = []
    true_mxu = padded_mxu = dw_flops = 0
    for l in tfm.layers:
        cls = type(l).__name__
        if cls not in ("Conv2D", "DepthwiseConv2D"):
            continue
        oshape = l.output.shape
        h, w = int(oshape[1]), int(oshape[2])
        cin = int(l.input.shape[-1])
        k = tuple(int(x) for x in l.kernel_size)
        if cls == "DepthwiseConv2D":
            flops = 2 * h * w * cin * k[0] * k[1]
            dw_flops += flops
            convs.append(
                {
                    "layer": l.name, "type": "depthwise", "hw": [h, w],
                    "cin": cin, "k": list(k),
                    "mflops": round(flops / 1e6, 2), "unit": "VPU",
                }
            )
            continue
        cout = int(l.filters)
        flops = 2 * h * w * cin * cout * k[0] * k[1]
        # im2col matmul [M, k*k*Cin] x [k*k*Cin, Cout]: both channel-derived
        # dims land in the 128-lane tile
        kc = cin * k[0] * k[1]
        pflops = 2 * h * w * pad(kc) * pad(cout)
        true_mxu += flops
        padded_mxu += pflops
        convs.append(
            {
                "layer": l.name, "type": "conv", "hw": [h, w],
                "cin": cin, "cout": cout, "k": list(k),
                "mflops": round(flops / 1e6, 2),
                "lane_utilization": round(flops / pflops, 3),
            }
        )

    # compiled HLO of the standalone forward: fusion inventory
    compiled = jax.jit(lambda x: model(x)).lower(feats3).compile()
    kinds = {}
    n_instr = 0
    for line in compiled.as_text().splitlines():
        n_instr += 1
        s = line.strip()
        if "= fusion(" in s or " fusion(" in s:
            import re

            m = re.search(r"kind=(\w+)", s)
            kinds[m.group(1) if m else "unknown"] = (
                kinds.get(m.group(1) if m else "unknown", 0) + 1
            )
    return {
        "per_conv": convs,
        "mxu_true_gflops": round(true_mxu / 1e9, 3),
        "mxu_padded_gflops": round(padded_mxu / 1e9, 3),
        "depthwise_vpu_gflops": round(dw_flops / 1e9, 3),
        "mfu_bound_from_lane_padding": round(true_mxu / padded_mxu, 3),
        "hlo_fusion_kinds": kinds,
        "hlo_text_lines": n_instr,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=256)
    ap.add_argument("--stages", action="store_true",
                    help="also time EfficientNet block prefixes (many compiles)")
    ap.add_argument("--bf16-stages", action="store_true",
                    help="run the block prefixes in bfloat16 (the AAT_FAST dtype)")
    ap.add_argument("--roofline", action="store_true",
                    help="per-conv lane-padding cost model + compiled HLO "
                         "fusion inventory for the EfficientNet forward")
    ap.add_argument("--trace", default=None, help="jax.profiler trace dir")
    ap.add_argument("--out", default=str(REPO / "PROFILE_FLAGSHIP.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, str(REPO))
    from bench import build_efficientnet_fixture, _env
    from audio_analysis_tpu.io.modelconfig import ModelConfig
    from audio_analysis_tpu.models.registry import load_classifier
    from audio_analysis_tpu.pipeline.classify import (
        _fused_group_program,
        _track_means,
    )
    from audio_analysis_tpu.pipeline.frontend import spectrogram_grid

    tmp = Path("/tmp/aat_bench_models")
    tmp.mkdir(exist_ok=True)
    effnet_dir = build_efficientnet_fixture(tmp)
    cfg = ModelConfig.load(Path(effnet_dir))
    sr = 48000
    n = args.windows
    sample = int(cfg.segment_length * sr)

    model = load_classifier(Path(effnet_dir), cfg)
    with _env(AAT_KERAS_BF16="1"):  # cache keys on the resolved dtype
        model_bf16 = load_classifier(Path(effnet_dir), cfg)

    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randn(60 * sr).astype(np.float32) * 0.1)
    base = np.sort(rng.randint(0, 60 * sr - sample, n)).astype(np.int64)
    vlo = jnp.zeros(n, jnp.int32)
    vhi = jnp.full(n, sample, jnp.int32)
    tidx = jnp.asarray(np.arange(n, dtype=np.int32) // 8)
    fused_args = (frames, jnp.asarray(base), vlo, vhi, tidx)

    report = {"n_windows": n}
    results = {}

    # -- full fused program, f32 and bf16 ----------------------------------
    with _env(AAT_PALLAS="0"):  # the old XLA-FFT parity composition
        prog = _fused_group_program([model], cfg, sr, sample, 32)
    results["fused_f32"] = _time(prog, fused_args)
    # current parity default: exact-Pallas frontend + f32 model
    with _env(AAT_PALLAS="exact"):
        prog_exact = _fused_group_program([model], cfg, sr, sample, 32)
    results["fused_parity_exact"] = _time(prog_exact, fused_args)
    with _env(AAT_PALLAS="0"):
        prog16 = _fused_group_program([model_bf16], cfg, sr, sample, 32)
    results["fused_bf16"] = _time(prog16, fused_args)
    # the AAT_FAST composition: Pallas DFT->mel frontend + bf16 model
    # (use_pallas is resolved and cache-keyed at program build)
    with _env(AAT_PALLAS="1"):
        prog_fast = _fused_group_program([model_bf16], cfg, sr, sample, 32)
    results["fused_fast"] = _time(prog_fast, fused_args)

    # -- stage 1: window materialisation (scan of dynamic slices) ----------
    @jax.jit
    def slice_only(frames, base, lo, hi):
        padded = jnp.pad(frames, (sample, sample))
        j = jnp.arange(sample, dtype=jnp.int32)

        def one(_, bvh):
            b, l, h = bvh
            w = jax.lax.dynamic_slice(padded, (b + sample,), (sample,))
            return None, jnp.where((j >= l) & (j < h), w, 0.0)

        _, grid = jax.lax.scan(one, None, (base.astype(jnp.int32), lo, hi))
        return grid

    results["slice_scan"] = _time(slice_only, (frames, jnp.asarray(base), vlo, vhi))
    grid = slice_only(frames, jnp.asarray(base), vlo, vhi)

    # -- stage 2: frontend (XLA FFT vs Pallas) ------------------------------
    fe_kw = dict(
        sr=sr, hop_length=int(cfg.hop_length), n_fft=int(cfg.n_fft),
        n_mels=int(cfg.n_mels), mel_break=float(cfg.break_freq), htk=True,
        fmin=cfg.fmin, fmax=cfg.fmax, power=float(cfg.power),
        db_scale=bool(cfg.db_scale), normalize=bool(cfg.normalize),
    )
    results["frontend_xla"] = _time(
        lambda g: spectrogram_grid(g, use_pallas=False, **fe_kw), (grid,)
    )
    for name, lvl in (
        ("frontend_pallas", 1),
        ("frontend_pallas_exact1", 2),
        ("frontend_pallas_exact2", 3),
    ):
        try:
            results[name] = _time(
                lambda g, lvl=lvl: spectrogram_grid(g, use_pallas=lvl, **fe_kw),
                (grid,),
            )
        except Exception as e:
            results[name] = f"error: {type(e).__name__}"

    feats = spectrogram_grid(grid, use_pallas=False, **fe_kw)
    feats3 = jnp.repeat(feats, 3, axis=-1)

    # -- stage 3: EfficientNet forward (f32, bf16) --------------------------
    fwd = jax.jit(lambda x: model(x))
    results["effnet_f32"] = _time(fwd, (feats3,))
    fwd16 = jax.jit(lambda x: model_bf16(x))
    results["effnet_bf16"] = _time(fwd16, (feats3,))
    probs = fwd(feats3)

    # -- stage 4: track means ----------------------------------------------
    means = jax.jit(lambda p, t: _track_means(p, t, 32))
    results["track_means"] = _time(means, (probs, tidx))

    report["seconds"] = {k: (round(v, 5) if isinstance(v, float) else v)
                        for k, v in results.items()}
    fused = results["fused_f32"]
    report["windows_per_s_f32"] = round(n / fused, 1)
    report["windows_per_s_parity_exact"] = round(
        n / results["fused_parity_exact"], 1
    )  # the SHIPPED parity default (split-bf16 exact Pallas frontend)
    report["windows_per_s_bf16"] = round(n / results["fused_bf16"], 1)
    report["windows_per_s_fast"] = round(n / results["fused_fast"], 1)
    parts = ["slice_scan", "frontend_xla", "effnet_f32", "track_means"]
    report["stage_fraction_of_fused"] = {
        k: round(results[k] / fused, 3) for k in parts if isinstance(results[k], float)
    }

    # -- EfficientNet block prefixes ----------------------------------------
    if args.stages:
        from audio_analysis_tpu.models.keras_graph import KerasModel

        km = KerasModel.load(
            Path(effnet_dir),
            compute_dtype="bfloat16" if args.bf16_stages else None,
        )
        names = [l.get("name") for l in km._layers]
        # last layer of each group (stem, blockN, top) in config order
        group_last = {}
        order = []
        for nm in names:
            if not nm:
                continue
            pref = nm.split("_")[0]
            if pref.startswith("block"):
                pref = pref[:6]  # block1a -> block1
            if pref not in group_last:
                order.append(pref)
            group_last[pref] = nm
        bounds = [(p, group_last[p]) for p in order]
        prefix_times = {}
        spec_orig = km._output_spec
        prev = 0.0
        try:
            for pref, nm in bounds:
                km._output_spec = [[nm, 0, 0]]
                try:
                    t = _time(jax.jit(lambda x: km(x)), (feats3,), reps=4, warm=1)
                except Exception as e:
                    prefix_times[nm] = f"error: {type(e).__name__}"
                    continue
                prefix_times[nm] = {
                    "cumulative_s": round(t, 5),
                    "delta_s": round(t - prev, 5),
                }
                prev = t
        finally:
            km._output_spec = spec_orig
        report["effnet_prefixes"] = prefix_times

    if args.roofline:
        report["roofline"] = _roofline(effnet_dir, model, feats3)

    if args.trace:
        with jax.profiler.trace(args.trace):
            for _ in range(4):
                out = prog(*fused_args)
            _force(out)
        report["trace_dir"] = args.trace

    Path(args.out).write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
