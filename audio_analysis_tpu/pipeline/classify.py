"""Recording classification: the reference's ``classify``
(src/identify_tracks.py:416-573) as a host orchestrator around three device
programs — end-scan, signal detection, and one fused
window-grid -> frontend -> CNN -> per-track-mean program per model group.

The reference recomputes a librosa STFT per 3-second window and calls
``model.predict`` per track; here every window of every track is gathered
into one [n_windows, sample_size] grid and the whole thing (frontend +
forward + ensemble/window means) runs as a handful of XLA programs with two
small host round-trips (end scan, detection mask).
"""

import logging
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from audio_analysis_tpu.io.audio import load_recording
from audio_analysis_tpu.io.modelconfig import ModelConfig, NON_BIRD
from audio_analysis_tpu.detect.signal import Signal, ModelResult, Prediction, MAX_FREQUENCY
from audio_analysis_tpu.detect.signal_noise import detect
from audio_analysis_tpu.detect.signal import get_tracks_from_signals
from audio_analysis_tpu.pipeline.samples import (
    plan_windows,
    gather_windows,
    pad_plan_to_bucket,
)
from audio_analysis_tpu.pipeline.frontend import spectrogram_grid
from audio_analysis_tpu.ops.filters import butter_bandpass_sos, sosfilt_array
from audio_analysis_tpu.models.registry import load_classifier


def _bucket(n, quantum=64):
    """Round a count up to a compile bucket."""
    return max(quantum, -(-n // quantum) * quantum)


# fused per-group programs keyed by (model identities, cfg knobs, shapes);
# stable keys keep jax.jit's own cache hot across recordings
_GROUP_PROGRAMS = {}


def _fused_group_program(
    models, cfg: ModelConfig, sr, sample_size, n_tracks_b, mesh=None,
    is_efficientnet=None,
):
    """One device program: window gather -> frontend -> every model ->
    ensemble mean -> per-track means. A single host round trip per model
    group (RPC latency to the TPU dominates small dispatches).

    `cfg` supplies the FRONTEND hyperparameters. For later model groups this
    is the FIRST group's config — the reference computes features once and
    feeds them to every group verbatim (src/identify_tracks.py:500-529,
    ``data = track_data``), even when the groups' spectral settings differ.
    Only the EfficientNet 3-channel repeat follows the CURRENT group's model
    name (src/identify_tracks.py:539-540), hence the separate
    `is_efficientnet` knob (defaults to cfg's own).

    With `mesh` (multi-host serving) the track-mean output is pinned
    replicated so every process can read every track's probabilities."""
    if is_efficientnet is None:
        is_efficientnet = cfg.is_efficientnet
    # resolve the frontend kernel choice NOW and bake it into the cache key:
    # the env default must not be frozen by whichever call traced first
    # (interleaved A/B benching flips AAT_PALLAS/AAT_FAST mid-process)
    from audio_analysis_tpu.pipeline.frontend import _use_pallas_default

    use_pallas = _use_pallas_default()
    from audio_analysis_tpu.ops.pallas.melspec import z_layout

    # With the Pallas frontend, the gather can emit the kernel's z layout
    # (pad | window | zeros as [rows, hop] rows, bf16) straight out of the
    # scan, with masking AND min-max normalisation fused in — the plain
    # [n_windows, sample] f32 grid, the separate normalise pass, and the
    # kernel's pad/cast/reshape pass all disappear from HBM. mfcc reads raw
    # windows, so that config keeps the plain grid. Resolved HERE (it reads
    # AAT_PALLAS_ALG) and keyed, like use_pallas.
    zlay = (
        z_layout(int(cfg.n_fft), int(cfg.hop_length), int(sample_size))
        if (use_pallas and not cfg.use_mfcc)
        else None
    )
    key = (
        tuple(id(m) for m in models),  # models are cached per path: stable
        bool(is_efficientnet),
        int(use_pallas),
        zlay,
        # content key for the mesh (id() keys once caused a
        # recompile-per-recording regression — see CLAUDE.md)
        None
        if mesh is None
        else (mesh.axis_names, tuple(d.id for d in mesh.devices.flat)),
        (
            cfg.name,
            int(cfg.hop_length),
            int(cfg.n_fft),
            int(cfg.n_mels),
            float(cfg.break_freq),
            bool(cfg.htk),
            cfg.fmin,
            cfg.fmax,
            float(cfg.power),
            bool(cfg.db_scale),
            bool(cfg.normalize),
            bool(cfg.mean_sub),
            bool(cfg.use_mfcc),
            int(cfg.channels),
        ),
        int(sr),
        int(sample_size),
        int(n_tracks_b),
    )
    prog = _GROUP_PROGRAMS.get(key)
    if prog is not None:
        return prog

    from audio_analysis_tpu.pipeline.frontend import spectrogram_grid

    def program(frames, base, vlo, vhi, tidx):
        # Window materialisation as a scan of dynamic_slices: the obvious
        # [n_windows, sample] gather runs ~25x slower on the TPU backend
        # (326 ms vs 13 ms for 256x3s windows, measured on the chip) —
        # contiguous DMA copies beat the general gather path. Padding the
        # flat PCM by one window on each side keeps negative/overhanging
        # bases exact (the reference's np.pad semantics, with the pad region
        # masked to zero below). int32 window bases cap the flat batch at
        # 2^31 samples (~12 chip-hours of 48 kHz audio per dispatch).
        if frames.dtype == jnp.int16:  # int16 PCM upload path (serve)
            frames = frames.astype(jnp.float32) / 32768.0
        n_w = base.shape[0]
        # K slices per scan step: the scan is the program's only sequential
        # chain, and one 3 s slice per step left it issuing 256 dependent
        # DMAs (~13 GB/s effective). K independent slices per step let the
        # DMAs overlap (window counts are bucketed to 64, so K=8 divides).
        k_unroll = 8 if n_w % 8 == 0 else 1
        if zlay is not None:
            # z-layout gather: each slice is the window WITH the kernel's
            # n_fft//2 centre-pad margin; masking maps the margins and the
            # invalid tail to true zeros, and the reference's normalize_data
            # (quirks included: epsilon added AFTER the division, then the
            # 0.5 shift — ops/scale.py::normalize_minmax) runs in-scan over
            # exactly the window region the plain grid would have normalised
            # (its masked zeros included). Output is the kernel's bf16 input
            # — same values the plain path would hand it after its separate
            # normalise + pad + cast passes.
            z_len = zlay[3]
            shift = int(cfg.n_fft) // 2
            padded = jnp.pad(frames, (sample_size + shift, sample_size + z_len))
            jz = jnp.arange(z_len, dtype=jnp.int32)
            region = (jz >= shift) & (jz < shift + sample_size)

            def slice_z(_, bvh):
                b, lo, hi = bvh  # each [k_unroll]
                w = jnp.stack(
                    [
                        jax.lax.dynamic_slice(
                            padded, (b[i] + sample_size,), (z_len,)
                        )
                        for i in range(k_unroll)
                    ]
                )
                w = jnp.where(
                    (jz[None, :] >= lo[:, None] + shift)
                    & (jz[None, :] < hi[:, None] + shift),
                    w,
                    0.0,
                )
                if cfg.normalize:
                    mn = jnp.min(
                        jnp.where(region, w, jnp.inf), axis=1, keepdims=True
                    )
                    w = w - mn
                    mx = jnp.max(
                        jnp.where(region, w, -jnp.inf), axis=1, keepdims=True
                    )
                    w = w / mx + 0.000001
                    w = (w - 0.5) * 2.0
                # the kernel consumes bf16 z on the fast level; exact levels
                # keep f32 all the way (bf16-rounded input IS fast's error)
                z_dt = jnp.bfloat16 if use_pallas == 1 else jnp.float32
                return None, jnp.where(region, w, 0.0).astype(z_dt)

            _, grid = jax.lax.scan(
                slice_z,
                None,
                (
                    base.astype(jnp.int32).reshape(-1, k_unroll),
                    vlo.reshape(-1, k_unroll),
                    vhi.reshape(-1, k_unroll),
                ),
            )
            grid = grid.reshape(n_w, z_len)
        else:
            padded = jnp.pad(frames, (sample_size, sample_size))
            j = jnp.arange(sample_size, dtype=jnp.int32)

            def slice_k(_, bvh):
                b, lo, hi = bvh  # each [k_unroll]
                w = jnp.stack(
                    [
                        jax.lax.dynamic_slice(
                            padded, (b[i] + sample_size,), (sample_size,)
                        )
                        for i in range(k_unroll)
                    ]
                )
                return None, jnp.where(
                    (j[None, :] >= lo[:, None]) & (j[None, :] < hi[:, None]), w, 0.0
                )

            _, grid = jax.lax.scan(
                slice_k,
                None,
                (
                    base.astype(jnp.int32).reshape(-1, k_unroll),
                    vlo.reshape(-1, k_unroll),
                    vhi.reshape(-1, k_unroll),
                ),
            )
            grid = grid.reshape(n_w, sample_size)
        feats = spectrogram_grid(
            grid,
            windows_is_z=zlay is not None,
            n_samples=sample_size if zlay is not None else None,
            sr=int(sr),
            hop_length=int(cfg.hop_length),
            n_fft=int(cfg.n_fft),
            n_mels=int(cfg.n_mels),
            mel_break=float(cfg.break_freq),
            htk=bool(cfg.htk),
            fmin=cfg.fmin,
            fmax=cfg.fmax,
            power=float(cfg.power),
            db_scale=bool(cfg.db_scale),
            normalize=bool(cfg.normalize),
            mean_sub=bool(cfg.mean_sub),
            use_mfcc=bool(cfg.use_mfcc),
            channels=int(cfg.channels),
            use_pallas=use_pallas,
        )
        if is_efficientnet:
            feats = jnp.repeat(feats, 3, axis=-1)  # reference :539-540
        probs = None
        for m in models:
            p = m.apply_fn(m.params, feats)
            probs = p if probs is None else probs + p
        probs = probs / len(models)
        return _track_means(probs, tidx, n_tracks_b)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        prog = jax.jit(program, out_shardings=NamedSharding(mesh, P()))
    else:
        prog = jax.jit(program)
    _GROUP_PROGRAMS[key] = prog
    return prog


def _apply_track_filters(frames, plan, sr):
    """Band-pass filter the frames of tracks that request it
    (reference: src/identify_tracks.py:152-161), returning one filtered copy
    per filtered track stacked [n_filtered, max_len]."""
    if not plan.filter_specs:
        return None
    segs = []
    sos_list = []
    max_len = max(
        plan.track_bounds[ti][1] - plan.track_bounds[ti][0]
        for ti, _, _ in plan.filter_specs
    )
    for ti, low, high in plan.filter_specs:
        g0, g1 = plan.track_bounds[ti]
        seg = jnp.zeros(max_len, dtype=jnp.float32)
        seg = seg.at[: g1 - g0].set(jax.lax.dynamic_slice(frames, (g0,), (g1 - g0,)))
        segs.append(seg)
        sos_list.append(butter_bandpass_sos(float(low), float(high), float(sr)))
    n_sections = max(len(s) for s in sos_list)
    sos_arr = np.zeros((len(sos_list), n_sections, 5), np.float32)
    sos_arr[:, :, 0] = 1.0  # identity sections for padding
    for i, s in enumerate(sos_list):
        sos_arr[i, : len(s)] = np.asarray(s, np.float32)
    stack = jnp.stack(segs)
    return sosfilt_array(jnp.asarray(sos_arr), stack)


def plan_for_config(length, sr, tracks, cfg: ModelConfig, rng=np.random):
    """The ONE place a ModelConfig's planning knobs map onto plan_windows.
    Every window-planning site (single-recording classify, batch serving's
    finish step, build_window_grid) routes through here — a knob added to
    the schema cannot silently diverge batch serving from the parity path."""
    return plan_windows(
        int(length),
        sr,
        tracks,
        cfg.segment_length,
        cfg.segment_stride,
        fmin=cfg.fmin,
        fmax=cfg.fmax,
        filter_freqs=cfg.filter_freq,
        filter_below=cfg.filter_below,
        pad_short_tracks=cfg.pad_short_tracks,
        rng=rng,
    )


def build_window_grid(frames, sr, tracks, cfg: ModelConfig, rng=np.random, length=None):
    """Plan + gather the window grid for a model config. Returns
    (grid [N, sample], plan).

    `length`: true recording length in samples when `frames` is a padded
    bucket row (serving). Windows are planned/clamped against it — exactly
    like the single-recording path whose frames have the true length — while
    the gather stays on the static padded row (no per-length recompiles)."""
    plan = plan_for_config(
        frames.shape[-1] if length is None else length, sr, tracks, cfg, rng=rng
    )
    return gather_window_grid(frames, sr, plan)


def gather_window_grid(frames, sr, plan):
    """Gather + per-track band-pass application for a PRECOMPUTED window
    plan. Serving's band-pass path reuses the plan its finish step already
    drew — planning consumes the shared rng (short-track random offsets),
    so re-planning here would draw AGAIN and diverge from a seeded
    single-recording run."""
    if len(plan.base) == 0:
        return jnp.zeros((0, plan.sample_size), jnp.float32), plan
    plan = pad_plan_to_bucket(plan)
    grid = gather_windows(frames, plan)
    filtered = _apply_track_filters(frames, plan, sr)
    if filtered is not None:
        grid = _overwrite_filtered_rows(grid, filtered, plan)
    return grid, plan


def _overwrite_filtered_rows(grid, filtered, plan):
    """Replace windows of band-passed tracks with gathers from the filtered
    segments (local coordinates)."""
    for row, (ti, _, _) in enumerate(plan.filter_specs):
        g0, _ = plan.track_bounds[ti]
        sel = np.nonzero(plan.track_index == ti)[0]
        j = jnp.arange(plan.sample_size)[None, :]
        base_local = jnp.asarray(plan.base[sel])[:, None] - g0
        idx = jnp.clip(base_local + j, 0, filtered.shape[-1] - 1)
        win = filtered[row][idx]
        valid = (j >= jnp.asarray(plan.valid_lo[sel])[:, None]) & (
            j < jnp.asarray(plan.valid_hi[sel])[:, None]
        )
        grid = grid.at[jnp.asarray(sel)].set(jnp.where(valid, win, 0.0))
    return grid


def features_for_config(grid, sr, cfg: ModelConfig):
    """Frontend over the grid (reference get_spect semantics)."""
    return spectrogram_grid(
        grid,
        sr=int(sr),
        hop_length=int(cfg.hop_length),
        n_fft=int(cfg.n_fft),
        n_mels=int(cfg.n_mels),
        mel_break=float(cfg.break_freq),
        htk=bool(cfg.htk),
        fmin=cfg.fmin,
        fmax=cfg.fmax,
        power=float(cfg.power),
        db_scale=bool(cfg.db_scale),
        normalize=bool(cfg.normalize),
        mean_sub=bool(cfg.mean_sub),
        use_mfcc=bool(cfg.use_mfcc),
        channels=int(cfg.channels),
    )


def _track_means(per_window_probs, track_index, n_tracks):
    """Mean over each track's windows on device
    (reference: np.mean(predictions, axis=0) per track, :551)."""
    seg = jnp.asarray(track_index, jnp.int32)
    sums = jax.ops.segment_sum(per_window_probs, seg, num_segments=n_tracks + 1)
    counts = jax.ops.segment_sum(
        jnp.ones((per_window_probs.shape[0],), jnp.float32), seg, num_segments=n_tracks + 1
    )
    return sums[:n_tracks] / jnp.maximum(counts[:n_tracks], 1.0)[:, None]


def classify(file, models, analyse_tracks, meta_data=None, rng=np.random, timer=None):
    """Reference-compatible entry: returns
    (tracks, length, signals, raw_length, bird_labels)."""
    from audio_analysis_tpu.utils.runtime import StageTimer

    timer = timer or StageTimer()
    with timer.stage("decode"):
        frames, sr = load_recording(file, prefer_int16=True)
    return classify_frames(
        frames, sr, models, analyse_tracks, meta_data, rng=rng, timer=timer
    )


def classify_frames(
    frames, sr, models, analyse_tracks, meta_data=None, rng=np.random, timer=None
):
    from audio_analysis_tpu.utils.runtime import StageTimer

    timer = timer or StageTimer()
    raw_length = len(frames) / sr
    # int16 PCM (what the 16-bit decode path produces) uploads at half the
    # bytes over the tunnel and converts to float32/32768 on device — the
    # dominant single-recording latency cost is this upload
    frames_np = np.asarray(frames)
    if frames_np.dtype == np.int16:
        from audio_analysis_tpu.io.pcmcodec import wire_codec_enabled

        if wire_codec_enabled():
            # lossless wire codec: ~1.5x less upload wall-time (see
            # io/pcmcodec.py); decode is exact so downstream is unchanged
            from audio_analysis_tpu.io.pcmcodec import upload_pcm

            frames_dev = upload_pcm(frames_np)[0, : len(frames_np)]
        else:
            frames_dev = jnp.asarray(frames_np)
    else:
        frames_dev = jnp.asarray(frames_np, dtype=jnp.float32)
    # fused end-scan + detection: one device round trip
    with timer.stage("detect"):
        length, signals = detect(frames_dev, sr)

    if analyse_tracks:
        if meta_data is None:
            return None
        tracks = []
        for t in meta_data["Tracks"]:
            signal = Signal(
                t["start"], t["end"], t.get("minFreq", 0), t.get("maxFreq", MAX_FREQUENCY)
            )
            signal.track_id = t["id"]
            tracks.append(signal)
    else:
        tracks = [s.copy() for s in signals]
        tracks = get_tracks_from_signals(tracks, length)
    if len(tracks) == 0:
        return [], length, [], raw_length, []

    # group models: pre-filter models run after the main ensemble group
    # (reference :444-455)
    pre_models, mean_models = [], []
    for model_file in models:
        cfg = ModelConfig.load(Path(model_file))
        if cfg.pre_model:
            pre_models.append((model_file, cfg))
        else:
            mean_models.append((model_file, cfg))
    grouped_models = [mean_models]
    if pre_models:
        grouped_models.append(pre_models)

    track_data = None  # (grid, plan) shared across groups like the reference
    feats_cache = None  # band-pass path: group-1 features, reused verbatim
    bird_labels = set()

    for model_group in grouped_models:
        if not model_group:
            continue
        if len(model_group) > 1:
            logging.info("Meaning predictions as have multiple models")
        predict_models = [
            (load_classifier(Path(mf), cfg), cfg) for mf, cfg in model_group
        ]
        cfg = predict_models[0][1]
        bird_labels.update(cfg.bird_labels)

        if cfg.name == "embeddings":
            # embeddings models classify embedding vectors per track
            # (reference: src/identify_tracks.py:498-499, 536-551); the
            # embedder comes from metadata "embedding_model" (local artifact,
            # runs TF-free) or the TF-Hub download fallback
            from audio_analysis_tpu.pipeline.embeddings import (
                chirp_embeddings,
                load_embedder,
            )

            embedder = load_embedder(cfg.raw.get("embedding_model"))
            data = chirp_embeddings(
                frames, sr, tracks, cfg.segment_stride, embedder=embedder
            )
            flat = [np.asarray(e) for track_e in data for e in track_e]
            seg = np.concatenate(
                [np.full(len(track_e), ti, np.int32) for ti, track_e in enumerate(data)]
            )
            if flat:
                embs = jnp.asarray(np.stack(flat))
                all_probs = [m(embs) for m, _ in predict_models]
                probs = sum(all_probs) / len(all_probs)
                track_probs = np.asarray(_track_means(probs, seg, len(tracks)))
                counts = np.bincount(seg, minlength=len(tracks))
                apply_thresholds(tracks, track_probs, counts, cfg)
            continue

        if track_data is None:
            plan = plan_for_config(frames_dev.shape[-1], sr, tracks, cfg, rng=rng)
            has_windows = len(plan.base) > 0
            plan = pad_plan_to_bucket(plan)
            # like the reference's ``data = track_data`` (:525-528): later
            # groups reuse the FIRST group's features verbatim, so the
            # feature-defining config travels with the plan
            track_data = (plan, has_windows, cfg)
        else:
            logging.info(
                "Re using track data this will cuase problems if the STFT "
                "settings are not the same for multiple models"
            )
        plan, has_windows, feat_cfg = track_data
        if not has_windows:
            # every track is out of the model's frequency band: the
            # reference's per-track loop just never predicts (empty data per
            # track, src/identify_tracks.py:537-538) — keep the tracks and
            # signals, skip inference for THIS group but keep iterating so
            # later groups still contribute their bird_labels
            # (src/identify_tracks.py:494 updates bird_labels per group, and
            # get_chirps consumes the union)
            continue

        models_only = [m for m, _ in predict_models]
        with timer.stage("infer"):
            if plan.filter_specs:
                # slow path: per-track band-passed grids (rare configs);
                # needs float PCM (the int16 fast path converts here)
                if feats_cache is None:
                    if frames_dev.dtype == jnp.int16:
                        frames_dev = frames_dev.astype(jnp.float32) / 32768.0
                    grid = gather_windows(frames_dev, plan)
                    filtered = _apply_track_filters(frames_dev, plan, sr)
                    if filtered is not None:
                        grid = _overwrite_filtered_rows(grid, filtered, plan)
                    feats_cache = features_for_config(grid, sr, feat_cfg)
                feats = feats_cache
                all_probs = []
                for model, mcfg in predict_models:
                    x = feats
                    if cfg.is_efficientnet:
                        x = jnp.repeat(x, 3, axis=-1)  # reference :539-540
                    all_probs.append(model(x))
                probs = sum(all_probs) / len(all_probs)
                track_probs = np.asarray(
                    _track_means(probs, plan.track_index, plan.n_tracks)
                )
            else:
                n_tracks_b = _bucket(plan.n_tracks, 8)
                prog = _fused_group_program(
                    models_only, feat_cfg, sr, plan.sample_size, n_tracks_b,
                    is_efficientnet=cfg.is_efficientnet,
                )
                track_probs = np.asarray(
                    prog(
                        frames_dev,
                        jnp.asarray(plan.base),
                        jnp.asarray(plan.valid_lo),
                        jnp.asarray(plan.valid_hi),
                        jnp.asarray(plan.track_index),
                    )
                )[: plan.n_tracks]

        windows_per_track = np.bincount(plan.track_index, minlength=plan.n_tracks)
        apply_thresholds(tracks, track_probs, windows_per_track, cfg)

    return tracks, length, signals, raw_length, list(bird_labels)


def apply_thresholds(tracks, track_probs, windows_per_track, cfg: ModelConfig):
    """Turn per-track mean probabilities into Prediction/ModelResult objects
    (reference: src/identify_tracks.py:553-571): labels above threshold keep
    their ebird ids; otherwise the argmax becomes a raw below-threshold
    prediction."""
    labels = cfg.labels
    ebird_ids = cfg.ebird_ids
    prob_thresh = cfg.threshold
    for ti, t in enumerate(tracks):
        if windows_per_track[ti] == 0:
            continue  # skipped/out-of-band track (reference :537-538)
        prediction = track_probs[ti]
        max_p = None
        result = ModelResult(cfg.name, cfg.pre_model)
        t.results.append(result)
        for i, p in enumerate(prediction):
            if max_p is None or p > max_p[1]:
                max_p = (i, p)
            if p >= prob_thresh:
                ebird_id = ebird_ids[i] if ebird_ids is not None else None
                result.add_prediction(labels[i], p, ebird_id, prob_thresh)
        if len(result.predictions) == 0:
            ebird_id = ebird_ids[max_p[0]] if ebird_ids is not None else None
            result.raw_prediction = Prediction(labels[max_p[0]], max_p[1], ebird_id)
