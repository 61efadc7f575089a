"""Batch-of-recordings serving (BASELINE config #5: batch -> per-track JSON).

A ``BatchAnalyzer`` keeps models and compiled programs warm and processes N
recordings with two device dispatches per batch + one per model group:

1. recordings stacked [B, T_bucket] -> one batched fused-detect dispatch
   (end-scan + masks for every recording);
2. host: CCL + track merging per recording, one combined window plan over
   the flattened [B*T] PCM with globally renumbered track ids;
3. one fused gather->frontend->models->track-means dispatch per model group
   for the WHOLE batch;
4. host: thresholds, master tags, chirps, cacophony index per recording.

On a mesh, the window grid shards along 'data' (DP/SP); single chip it's one
big MXU-saturating batch. RPC latency amortises across the batch — this is
the production-throughput path.
"""

import logging
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from audio_analysis_tpu.io.modelconfig import ModelConfig, NON_BIRD
from audio_analysis_tpu.detect.signal import Signal, MAX_FREQUENCY
from audio_analysis_tpu.detect.signal import get_tracks_from_signals
from audio_analysis_tpu.detect.signal_noise import (
    detect_batch,
    detect_batch_dispatch,
    detect_batch_finish,
)
from audio_analysis_tpu.pipeline.samples import WindowPlan, pad_plan_to_bucket
from audio_analysis_tpu.pipeline.classify import (
    _fused_group_program,
    _bucket,
    apply_thresholds,
    gather_window_grid,
    plan_for_config,
    features_for_config,
    _track_means,
)
from audio_analysis_tpu.pipeline.cacophony import (
    calc_cacophony_index,
    filter_tracks,
    get_chirps,
    get_max_chirps,
)
from audio_analysis_tpu.pipeline.ebird import filter_by_location
from audio_analysis_tpu.models.registry import load_classifier


from contextlib import nullcontext as _nullctx

from audio_analysis_tpu.io.pcmcodec import wire_codec_enabled as _wire_codec_enabled


class BatchAnalyzer:
    """Warm serving handle: analyse lists of recordings efficiently."""

    def __init__(self, models, sr=48000, bucket_seconds=60, rng=np.random, mesh=None):
        """`mesh`: optional jax.sharding.Mesh with a 'data' axis — recordings
        shard across chips for detection and the window grid shards for
        classification (XLA inserts the gather collectives)."""
        self.sr = int(sr)
        self.bucket = int(bucket_seconds * sr)
        self.rng = rng
        self.mesh = mesh
        self.pre_models = []
        self.mean_models = []
        for model_file in models:
            cfg = ModelConfig.load(Path(model_file))
            entry = (load_classifier(Path(model_file), cfg), cfg)
            (self.pre_models if cfg.pre_model else self.mean_models).append(entry)
        self.groups = [g for g in (self.mean_models, self.pre_models) if g]

    # -- public -------------------------------------------------------------

    def prewarm(self, batch_size=8, seed=0):
        """Compile the steady-state serving programs before the first real
        batch: a synthetic bucket-length batch with tonal content (tones
        detect as real tracks, so the window-gather/frontend/model/track-
        means programs compile too, not just the detect program) runs
        through ``analyse_recordings`` and its results are discarded.

        Covers the common-case program set — the codec decode tiers, the
        detect program at the standard bucket, speculative run extraction,
        and each model group's fused program at the first window/track
        buckets. Unusually busy recordings can still hit a bigger window
        bucket and compile on first sight; the persistent compile cache
        (utils.runtime.enable_compilation_cache) absorbs those across
        process restarts.

        Runs on a PRIVATE rng: a seeded analyzer must produce the same
        stream of results whether or not it was prewarmed (window planning
        draws from self.rng — pinned by test). Returns the warm-up batch's
        per-stage seconds (the compile cost, for logs)."""
        from audio_analysis_tpu.utils.runtime import StageTimer

        prng = np.random.RandomState(seed)
        t = np.arange(self.bucket, dtype=np.float32) / self.sr
        recs = []
        for i in range(int(batch_size)):
            y = 0.01 * prng.randn(self.bucket).astype(np.float32)
            # a few well-separated tones -> a handful of tracks per
            # recording (the shape a real bird-audio batch produces)
            for k, f0 in enumerate((900.0, 2600.0, 4800.0)):
                t0 = (2.0 + 7.0 * k + 0.5 * i) % max(1.0, t[-1] - 2.0)
                m = (t >= t0) & (t < t0 + 1.0)
                y[m] += 0.4 * np.sin(2 * np.pi * (f0 + 37.0 * i) * t[m]).astype(
                    np.float32
                )
            recs.append((np.clip(y, -1, 1) * 32767).astype(np.int16))
        timer = StageTimer()
        saved_rng = self.rng
        self.rng = np.random.RandomState(seed)
        try:
            self.analyse_recordings(recs, timer=timer)
        finally:
            self.rng = saved_rng
        return timer.as_dict()

    def analyse_recordings(
        self, recordings, sr=None, timer=None, meta_data=None, analyse_tracks=False
    ):
        """recordings: list of mono float32/int16 numpy arrays at self.sr.
        Returns a list of result dicts (species_identify schema).

        `meta_data`: optional list (len B) of per-recording sidecar dicts
        (or None entries). Location metadata drives eBird filtering exactly
        like the single-recording path (pipeline/analysis.py:43-44 —
        filter_by_location BEFORE master tags). With `analyse_tracks=True`
        tracks come from each entry's "Tracks" list instead of signal
        detection (reference --analyse-tracks, src/identify_tracks.py:
        422-433) — detection is skipped entirely and results carry only
        per-track labels (no chirps/cacophony block, matching
        pipeline/analysis.py:55-69); a recording with no metadata yields
        an empty track list, like the single path's None return.

        `timer`: optional StageTimer; with AAT_TIMINGS=1 each result carries
        the batch-level per-stage wall clock under "timing" (the stages are
        shared by the whole batch — serving works in batch dispatches)."""
        import os

        from audio_analysis_tpu.utils.runtime import StageTimer

        timer = timer or StageTimer()
        with timer.stage("dispatch"):
            handle = self._dispatch(recordings, sr, meta_data, analyse_tracks)
        results = self._finish(handle, timer=timer)
        if os.environ.get("AAT_TIMINGS", "").lower() in ("1", "true", "on"):
            for r in results:
                r["timing"] = timer.as_dict()
        return results

    def analyse_stream(self, batches, sr=None, meta_batches=None, analyse_tracks=False):
        """Pipelined serving: yields result lists per batch, dispatching the
        next batch's upload + detection while the current batch's host work
        (CCL, track merge, post) runs — JAX dispatch is async, so device and
        host overlap with no extra machinery.

        `meta_batches`: optional iterable zipped with `batches` — each item
        a list of per-recording sidecar dicts (see analyse_recordings).
        `analyse_tracks` applies to the whole stream.

        By default (AAT_ASYNC_UPLOAD unset or =1) each batch's encode + wire
        transfer additionally runs on a background thread, so the NEXT
        batch's upload (the tunnel wire is the serving bottleneck) overlaps
        the current batch's host CCL/post AND its inference dispatch, instead
        of only the device queue. Results are bit-identical — the thread only
        reorders when the wire is busy, never what is computed (single worker
        preserves batch order); measured +9% full-pipeline throughput in the
        interleaved on-chip A/B (BENCH r3: 475 vs 436 audio-s/s parity).
        AAT_ENCODE_AHEAD=1 splits the dispatch into a two-stage pipeline
        (a dedicated encode worker prepares batch k+1 while the upload
        worker handles batch k). Measured a WASH (paired-ratio median 0.95
        over 10 interleaved windows): the ~170 ms host encode looks like it
        sits on the wire's critical path, but jnp.asarray/device_put return
        at QUEUE time, so the transfer engine is still streaming batch k-1
        while the single worker encodes batch k — encode was never actually
        idling the wire, and the extra thread only adds scheduling noise.
        Default off; the knob remains for re-measurement on faster links.
        AAT_ASYNC_UPLOAD=0 reverts to fully synchronous dispatch. Forced off
        under multi-host: _dispatch runs collectives whose cross-process
        ordering must match _finish's."""
        from audio_analysis_tpu.utils.runtime import env_flag

        flag = env_flag("AAT_ASYNC_UPLOAD")
        use_async = (True if flag is None else flag) and not self._multihost
        metas = iter(meta_batches) if meta_batches is not None else None
        if not use_async:
            prev = None
            for batch in batches:
                md = next(metas) if metas is not None else None
                handle = self._dispatch(batch, sr, md, analyse_tracks)
                if prev is not None:
                    yield self._finish(prev)
                prev = handle
            if prev is not None:
                yield self._finish(prev)
            return
        from concurrent.futures import ThreadPoolExecutor

        ahead = env_flag("AAT_ENCODE_AHEAD")
        two_stage = bool(ahead)  # default OFF: measured a wash (see above)
        enc_pool = ThreadPoolExecutor(max_workers=1)
        # with the knob off, both stages share ONE worker: prepare then
        # dispatch run back-to-back on it — exactly the old single-stage
        # behaviour (the in-process A/B baseline)
        up_pool = ThreadPoolExecutor(max_workers=1) if two_stage else enc_pool
        try:
            prev = None
            for batch in batches:
                md = next(metas) if metas is not None else None
                prep = enc_pool.submit(self._prepare, batch, sr, md, analyse_tracks)
                fut = up_pool.submit(self._dispatch_when_ready, prep)
                if prev is not None:
                    # prev's upload ran while the batch BEFORE it finished;
                    # .result() only blocks if the wire is still busy
                    yield self._finish(prev.result())
                prev = fut
            if prev is not None:
                yield self._finish(prev.result())
        finally:
            enc_pool.shutdown(wait=True)
            if two_stage:
                up_pool.shutdown(wait=True)

    def _dispatch_when_ready(self, prep_future):
        return self._dispatch_prepared(prep_future.result())

    # -- two-phase internals --------------------------------------------------

    @property
    def _multihost(self):
        return self.mesh is not None and jax.process_count() > 1

    # -- embeddings model groups ----------------------------------------------

    @staticmethod
    def _is_embeddings(group):
        """Group-level decision keyed on the FIRST model's name, exactly like
        the single path (pipeline/classify.py:473; reference
        src/identify_tracks.py:498-499 — model_name is the group's first
        config)."""
        return group[0][1].name == "embeddings"

    def _embedder_for(self, cfg):
        """Load (and cache) the group's embedder — the load can pull a local
        .keras/SavedModel artifact or the TF-Hub fallback, so do it once per
        analyzer, keyed on the configured artifact path."""
        from audio_analysis_tpu.pipeline.embeddings import load_embedder

        key = cfg.raw.get("embedding_model")
        cache = getattr(self, "_embedder_cache", None)
        if cache is None:
            cache = self._embedder_cache = {}
        if key not in cache:
            cache[key] = load_embedder(key)
        return cache[key]

    def _infer_embeddings(self, group, stacked, n_valid, sr, all_tracks,
                          only_rec=None):
        """Per-recording embeddings inference (reference
        src/identify_tracks.py:498-499, 536-551): embed every window of every
        track from the RAW recording PCM (band-pass filters never apply —
        the reference embeds from `file` directly), classify the embedding
        vectors with the group's ensemble, and mean per track. Mirrors
        pipeline/classify.py's embeddings branch recording-by-recording; the
        embedder forward is one batched call per recording. `only_rec`
        restricts to a single recording (the band-pass path interleaves
        groups per recording)."""
        from audio_analysis_tpu.pipeline.embeddings import chirp_embeddings

        cfg = group[0][1]
        embedder = self._embedder_for(cfg)
        for b, tracks in enumerate(all_tracks):
            if only_rec is not None and b != only_rec:
                continue
            if not tracks:
                continue
            frames = np.asarray(stacked[b][: int(n_valid[b])])
            data = chirp_embeddings(
                frames, sr, tracks, cfg.segment_stride, embedder=embedder
            )
            flat = [np.asarray(e) for track_e in data for e in track_e]
            if not flat:
                continue
            seg = np.concatenate(
                [
                    np.full(len(track_e), ti, np.int32)
                    for ti, track_e in enumerate(data)
                ]
            )
            embs = jnp.asarray(np.stack(flat))
            all_probs = [m(embs) for m, _ in group]
            probs = sum(all_probs) / len(all_probs)
            track_probs = np.asarray(_track_means(probs, seg, len(tracks)))
            counts = np.bincount(seg, minlength=len(tracks))
            apply_thresholds(tracks, track_probs, counts, cfg)

    def _dispatch(self, recordings, sr=None, meta_data=None, analyse_tracks=False):
        return self._dispatch_prepared(
            self._prepare(recordings, sr, meta_data, analyse_tracks)
        )

    def _prepare(self, recordings, sr=None, meta_data=None, analyse_tracks=False):
        """Host-only half of `_dispatch`: validation, stacking, and (codec
        path) the wire ENCODE — no device interaction, so the stream's
        encode worker can run it for batch k+1 while batch k still owns the
        wire. Measured inline, the encode idled the tunnel ~170 ms (median;
        up to ~340 ms under GIL contention) per batch — the single biggest
        non-bandwidth term in the serving cycle (tools/exp_stream_timeline.py)."""
        sr = int(sr or self.sr)
        B = len(recordings)
        if self._multihost:
            # every process runs the SAME global program: per-host batch
            # sizes must agree (an empty or uneven feed would diverge the
            # collectives and hang the job) — validate collectively, which
            # also synchronises the error across processes
            from audio_analysis_tpu.parallel.distributed import allgather_host_values

            counts = set(allgather_host_values(B))
            if len(counts) != 1 or 0 in counts:
                raise ValueError(
                    "multi-host serving requires equal non-empty per-host "
                    f"batches; got per-process sizes {sorted(counts)}"
                )
            # the bucket must be identical on every process (one global
            # program); recordings are the caller's per-host feed
            t_bucket = self.bucket
            longest = max(len(r) for r in recordings)
            if longest > t_bucket:
                raise ValueError(
                    f"multi-host serving requires recordings <= bucket_seconds"
                    f" ({longest} > {t_bucket} samples)"
                )
        elif B == 0:
            return None
        else:
            t_bucket = max(
                self.bucket, max(-(-len(r) // self.sr) * self.sr for r in recordings)
            )
        # int16 PCM uploads at half the bytes and converts on device
        # (bit-identical to the 16-bit decode scaling); mixed input falls
        # back to float32.
        all_i16 = all(np.asarray(r).dtype == np.int16 for r in recordings)
        # the codec decodes onto a single device — skip it under multi-host
        # (per-process feeding) and on a mesh (the raw upload path keeps the
        # recordings sharded along 'data'; a tunnel-attached mesh does not
        # exist, so the codec's wire saving has no mesh use case)
        use_codec = (
            all_i16
            and not self._multihost
            and self.mesh is None
            and _wire_codec_enabled()
        )
        if use_codec:
            # the wire codec works on BLOCK-sample blocks; a slightly larger
            # bucket is invisible downstream (n_valid masks everything)
            from audio_analysis_tpu.io.pcmcodec import BLOCK as _PCM_BLOCK

            t_bucket = -(-t_bucket // _PCM_BLOCK) * _PCM_BLOCK
        dtype = np.int16 if all_i16 else np.float32
        stacked = np.zeros((B, t_bucket), dtype)
        n_valid = np.zeros(B, np.int32)
        for i, r in enumerate(recordings):
            stacked[i, : len(r)] = r
            n_valid[i] = len(r)
        enc = None
        if use_codec:
            from audio_analysis_tpu.io.pcmcodec import encode_pcm

            enc = encode_pcm(stacked)
        return (stacked, n_valid, t_bucket, B, sr, use_codec, enc,
                meta_data, analyse_tracks)

    def _dispatch_prepared(self, prep):
        """Device half of `_dispatch`: upload (codec decode or device_put)
        and the detect-program dispatch (skipped under analyse_tracks —
        tracks come from metadata, and nothing downstream consumes the
        detected signals in that mode)."""
        if prep is None:
            return None
        (stacked, n_valid, t_bucket, B, sr, use_codec, enc,
         meta_data, analyse_tracks) = prep
        if use_codec:
            # lossless residual codec + multi-stream tier upload + on-device
            # unpack: measured 1.5x faster than the raw int16 device_put for
            # an 8x60s batch on the tunnel-attached chip (io/pcmcodec.py)
            from audio_analysis_tpu.io.pcmcodec import upload_pcm_encoded

            frames_dev = upload_pcm_encoded(stacked, enc)
            detect_handle = (
                None if analyse_tracks
                else detect_batch_dispatch(frames_dev, n_valid, sr)
            )
        elif self._multihost:
            from audio_analysis_tpu.parallel.distributed import make_global_batch
            from jax.sharding import PartitionSpec as P

            # per-process feeding: this host contributes only its block
            frames_dev = make_global_batch(self.mesh, stacked)
            n_valid_dev = make_global_batch(self.mesh, n_valid, P("data"))
            detect_handle = (
                None if analyse_tracks
                else detect_batch_dispatch(frames_dev, n_valid_dev, sr)
            )
        else:
            if self.mesh is not None and B % self.mesh.shape["data"] == 0:
                from jax.sharding import NamedSharding, PartitionSpec as P

                frames_dev = jax.device_put(
                    stacked, NamedSharding(self.mesh, P("data", None))
                )
            else:
                frames_dev = jnp.asarray(stacked)
            detect_handle = (
                None if analyse_tracks
                else detect_batch_dispatch(frames_dev, n_valid, sr)
            )
        return (detect_handle, frames_dev, n_valid, t_bucket, B, sr, stacked,
                meta_data, analyse_tracks)

    def _finish(self, handle, timer=None):
        from audio_analysis_tpu.utils.runtime import StageTimer

        timer = timer or StageTimer()
        if handle is None:
            return []
        (detect_handle, frames_dev, n_valid, t_bucket, B, sr, stacked,
         meta_data, analyse_tracks) = handle
        rng = self.rng
        spectral_groups = [g for g in self.groups if not self._is_embeddings(g)]
        # window planning is a SPECTRAL-group concern (embeddings groups
        # window the raw PCM themselves); embeddings-only analyzers must not
        # draw from the shared rng — the single path never plans for them
        # (classify.py's embeddings branch `continue`s before track_data)
        cfg0 = spectral_groups[0][0][1] if spectral_groups else None
        per_rec_tracks = []
        all_tracks = []
        plans = []
        if analyse_tracks:
            # tracks from sidecar metadata (reference --analyse-tracks,
            # src/identify_tracks.py:422-433); no detection ran
            with timer.stage("plan"):
                for b in range(B):
                    md = meta_data[b] if meta_data is not None else None
                    tracks = []
                    if md is not None:
                        # md["Tracks"] unguarded on purpose: a sidecar
                        # WITHOUT the key raises KeyError exactly like the
                        # single path / reference (src/identify_tracks.py:
                        # 425 meta_data["Tracks"]); only md=None degrades
                        # to the empty track list (the single path's None
                        # return)
                        for t in md["Tracks"]:
                            s = Signal(
                                t["start"], t["end"],
                                t.get("minFreq", 0),
                                t.get("maxFreq", MAX_FREQUENCY),
                            )
                            s.track_id = t["id"]
                            tracks.append(s)
                    per_rec_tracks.append((int(n_valid[b]) / sr, [], tracks))
                    if cfg0 is not None:
                        plans.append(
                            plan_for_config(n_valid[b], sr, tracks, cfg0, rng=rng)
                        )
                    all_tracks.append(tracks)
        else:
            with timer.stage("detect"):
                detections = detect_batch_finish(detect_handle)
            with timer.stage("plan"):
                for b, (length, signals) in enumerate(detections):
                    tracks = get_tracks_from_signals(
                        [s.copy() for s in signals], length
                    )
                    per_rec_tracks.append((length, signals, tracks))
                    if cfg0 is not None:
                        plans.append(
                            plan_for_config(n_valid[b], sr, tracks, cfg0, rng=rng)
                        )
                    all_tracks.append(tracks)

        if self._multihost:
            return self._finish_multihost(
                per_rec_tracks, all_tracks, plans, frames_dev, n_valid, t_bucket, B, sr,
                stacked, timer=timer, meta_data=meta_data,
                analyse_tracks=analyse_tracks,
            )

        if spectral_groups and any(p.filter_specs for p in plans):
            # some tracks need their per-track Butterworth band-pass
            # (reference: src/identify_tracks.py:152-161) — take the
            # per-recording grid path that applies it BEFORE building the
            # combined plan / mesh-replicating the PCM (the replicated
            # device_put of the whole batch would be discarded here).
            # Embeddings groups interleave at their exact listed position
            # inside _infer_with_filters (per-track prediction order feeds
            # master-tag arbitration).
            with timer.stage("infer"):
                self._infer_with_filters(
                    frames_dev, sr, all_tracks, plans,
                    stacked=stacked, n_valid=n_valid,
                )
            with timer.stage("post"):
                return self._post(
                    per_rec_tracks, all_tracks, n_valid, sr, B,
                    meta_data=meta_data, analyse_tracks=analyse_tracks,
                )

        track_offset = np.cumsum([0] + [len(t) for t in all_tracks])
        n_total_tracks = int(track_offset[-1])

        combined = self._combine_plans(plans, t_bucket) if spectral_groups else None
        if spectral_groups:
            flat_frames = frames_dev.reshape(-1)
            if self.mesh is not None:
                # replicate PCM for the window gather (local gathers, no
                # collective); the WINDOW axis shards instead — the only
                # cross-device op is the psum XLA inserts for the track means.
                from jax.sharding import NamedSharding, PartitionSpec as P

                flat_frames = jax.device_put(
                    flat_frames, NamedSharding(self.mesh, P())
                )

        # dispatch EVERY spectral group's program before blocking on any
        # result: a per-group blocking np.asarray would serialise group-2's
        # device work behind group-1's tunnel round trip (same fix as the
        # detect finish path — see detect_batch_finish). The plan arrays are
        # identical across groups, so they upload once. Results are then
        # CONSUMED in full listed-group order (embeddings groups run in
        # place) so per-track prediction order matches the single path —
        # master-tag arbitration depends on it.
        run_embeds = n_total_tracks > 0
        run_spectral = bool(
            spectral_groups and n_total_tracks > 0 and len(combined.base) > 0
        )
        pending = []
        if run_spectral:
            padded = pad_plan_to_bucket(
                WindowPlan(
                    base=combined.base,
                    valid_lo=combined.valid_lo,
                    valid_hi=combined.valid_hi,
                    track_index=combined.track_index,
                    n_tracks=n_total_tracks,
                    sample_size=combined.sample_size,
                )
            )

            def put(a):
                if (
                    self.mesh is not None
                    and len(a) % self.mesh.shape["data"] == 0
                ):
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    return jax.device_put(a, NamedSharding(self.mesh, P("data")))
                return jnp.asarray(a)

            plan_dev = (
                put(padded.base), put(padded.valid_lo),
                put(padded.valid_hi), put(padded.track_index),
            )
            windows_per_track = np.bincount(
                padded.track_index, minlength=n_total_tracks
            )
            n_tracks_b = _bucket(n_total_tracks, 8)
            with timer.stage("infer"):
                for group in spectral_groups:
                    cfg = group[0][1]
                    models_only = [m for m, _ in group]
                    # frontend params come from the FIRST group's config —
                    # the reference reuses group-1's computed features for
                    # every later group (src/identify_tracks.py:525-528);
                    # only the EfficientNet channel repeat follows the
                    # current group's model name
                    prog = _fused_group_program(
                        models_only, cfg0, sr, combined.sample_size, n_tracks_b,
                        is_efficientnet=cfg.is_efficientnet,
                    )
                    probs_dev = prog(flat_frames, *plan_dev)
                    try:
                        probs_dev.copy_to_host_async()
                    except (AttributeError, RuntimeError):
                        pass
                    pending.append((cfg, probs_dev))

        if run_embeds or run_spectral:
            pending_iter = iter(pending)
            with timer.stage("infer"):
                for group in self.groups:
                    if self._is_embeddings(group):
                        if run_embeds:
                            self._infer_embeddings(
                                group, stacked, n_valid, sr, all_tracks
                            )
                    elif run_spectral:
                        cfg, probs_dev = next(pending_iter)
                        track_probs = np.asarray(probs_dev)[:n_total_tracks]
                        for b in range(B):
                            lo, hi = track_offset[b], track_offset[b + 1]
                            apply_thresholds(
                                all_tracks[b],
                                track_probs[lo:hi],
                                windows_per_track[lo:hi],
                                cfg,
                            )

        with timer.stage("post"):
            return self._post(
                per_rec_tracks, all_tracks, n_valid, sr, B,
                meta_data=meta_data, analyse_tracks=analyse_tracks,
            )

    def _finish_multihost(
        self, per_rec_tracks, all_tracks, plans, frames_dev, n_valid, t_bucket, B, sr,
        stacked, timer=None, meta_data=None, analyse_tracks=False,
    ):
        """SPMD inference across processes: every process executes the SAME
        global programs (windows sharded along 'data'; XLA inserts the psum
        for the track means and the all-gather for the replicated PCM), does
        host post-processing only for ITS recordings, then results are
        all-gathered so process 0 holds the full batch (single-writer
        contract, reference analyse.py:454-468)."""
        from audio_analysis_tpu.parallel import distributed as dist
        from jax.sharding import PartitionSpec as P

        spectral_groups = [g for g in self.groups if not self._is_embeddings(g)]

        # embeddings inference is per-process host+local-device work with NO
        # collectives, so each process handles only its local recordings;
        # group identity is identical across processes, so every branch
        # below is collectively consistent. Groups run / results append in
        # LISTED order (per-track prediction order feeds master-tag
        # arbitration, matching the single path).

        # per-track band-pass (filter_freq/filter_below, reference
        # src/identify_tracks.py:152-161): the sosfilt work is tiny, so each
        # process runs the per-recording single-device path over ITS local
        # recordings (`stacked` is this host's feed; no collectives inside),
        # then joins the usual global result all-gather. The path choice is
        # agreed COLLECTIVELY — a process whose local plans happen to have no
        # filtered track must not enter the SPMD programs alone.
        has_filters = bool(spectral_groups) and any(p.filter_specs for p in plans)
        if any(dist.allgather_host_values(int(has_filters))):
            with timer.stage("infer") if timer else _nullctx():
                self._infer_with_filters(
                    jnp.asarray(stacked), sr, all_tracks, plans,
                    stacked=stacked, n_valid=n_valid,
                )
            with timer.stage("post") if timer else _nullctx():
                results = self._post(
                    per_rec_tracks, all_tracks, n_valid, sr, B,
                    meta_data=meta_data, analyse_tracks=analyse_tracks,
                )
                return dist.allgather_results(results)

        if not spectral_groups:
            with timer.stage("infer") if timer else _nullctx():
                for group in self.groups:
                    self._infer_embeddings(group, stacked, n_valid, sr, all_tracks)
            with timer.stage("post") if timer else _nullctx():
                results = self._post(
                    per_rec_tracks, all_tracks, n_valid, sr, B,
                    meta_data=meta_data, analyse_tracks=analyse_tracks,
                )
                return dist.allgather_results(results)

        base_row = dist.local_offset(frames_dev)
        combined = self._combine_plans(plans, t_bucket, base_row=base_row)
        n_local_tracks = combined.n_tracks
        track_counts = dist.allgather_host_values(n_local_tracks)
        track_offset0 = sum(track_counts[: jax.process_index()])
        n_total_tracks = sum(track_counts)

        # globally consistent window bucket (every process must pad its
        # local block to the same shape — one global program)
        w_counts = dist.allgather_host_values(len(combined.base))
        w_target = max(64, -(-max(w_counts) // 64) * 64)
        local_windows_per_track = np.bincount(
            combined.track_index, minlength=max(n_local_tracks, 1)
        )
        shifted = WindowPlan(
            base=combined.base,
            valid_lo=combined.valid_lo,
            valid_hi=combined.valid_hi,
            track_index=combined.track_index + track_offset0,
            n_tracks=n_total_tracks,
            sample_size=combined.sample_size,
        )
        padded = pad_plan_to_bucket(shifted, target=w_target)

        flat_frames = dist.replicate(self.mesh, frames_dev).reshape(-1)
        n_windows_global = sum(w_counts)
        track_offsets = np.cumsum([0] + [len(t) for t in all_tracks])
        cfg0 = spectral_groups[0][0][1]
        for group in self.groups:
            if self._is_embeddings(group):
                # local host work, no collectives; group list is identical
                # across processes so everyone takes this branch together
                with timer.stage("infer") if timer else _nullctx():
                    self._infer_embeddings(group, stacked, n_valid, sr, all_tracks)
                continue
            cfg = group[0][1]
            models_only = [m for m, _ in group]
            if n_total_tracks == 0 or n_windows_global == 0:
                # globally agreed (both counts are all-gathered): every
                # process skips the SPMD program together; later embeddings
                # groups still run (they no-op without tracks anyway)
                continue
            n_tracks_b = _bucket(n_total_tracks, 8)
            # group-1 features for every group (reference :525-528)
            prog = _fused_group_program(
                models_only, cfg0, sr, combined.sample_size, n_tracks_b,
                mesh=self.mesh, is_efficientnet=cfg.is_efficientnet,
            )

            def put(a):
                return dist.make_global_batch(self.mesh, a, P("data"))

            with timer.stage("infer") if timer else _nullctx():
                track_probs = dist.replicated_np(
                    prog(
                        flat_frames,
                        put(padded.base),
                        put(padded.valid_lo),
                        put(padded.valid_hi),
                        put(padded.track_index),
                    )
                )[:n_total_tracks]
            local_probs = track_probs[track_offset0 : track_offset0 + n_local_tracks]
            for b in range(B):
                lo, hi = track_offsets[b], track_offsets[b + 1]
                apply_thresholds(
                    all_tracks[b],
                    local_probs[lo:hi],
                    local_windows_per_track[lo:hi],
                    cfg,
                )

        with timer.stage("post") if timer else _nullctx():
            results = self._post(
                per_rec_tracks, all_tracks, n_valid, sr, B,
                meta_data=meta_data, analyse_tracks=analyse_tracks,
            )
            return dist.allgather_results(results)

    def _infer_with_filters(self, frames_dev, sr, all_tracks, plans,
                            stacked=None, n_valid=None):
        """Per-recording inference with the band-pass path (rare configs).
        Matches classify_frames' slow path semantics per recording. Reuses
        the window plans the finish step already drew (planned against each
        recording's TRUE length): planning consumes the shared rng, so
        re-planning here would double-draw and diverge from a seeded
        single-recording run. Runs self.groups in LISTED order per recording
        — embeddings groups (which window raw PCM themselves, band-pass
        never applies) execute at their exact position so per-track
        prediction order matches the single path."""
        spectral = [g for g in self.groups if not self._is_embeddings(g)]
        cfg0 = spectral[0][0][1] if spectral else None
        for b, tracks in enumerate(all_tracks):
            if not tracks:
                continue
            frames_b = frames_dev[b]
            if frames_b.dtype == jnp.int16:
                frames_b = frames_b.astype(jnp.float32) / 32768.0
            else:
                frames_b = frames_b.astype(jnp.float32)
            track_data = None
            feats = None
            for group in self.groups:
                cfg = group[0][1]
                if self._is_embeddings(group):
                    self._infer_embeddings(
                        group, stacked, n_valid, sr, all_tracks, only_rec=b
                    )
                    continue
                if track_data is None:
                    track_data = gather_window_grid(frames_b, sr, plans[b])
                grid, plan = track_data
                if len(plan.base) == 0:
                    # every track out of band: skip THIS spectral group's
                    # inference but keep iterating (single path `continue`s,
                    # classify.py has_windows=False — later embeddings
                    # groups must still run)
                    continue
                if feats is None:
                    # group-1 features are reused verbatim by later groups
                    # (reference src/identify_tracks.py:525-528)
                    feats = features_for_config(grid, sr, cfg0)
                all_probs = []
                for model, _ in group:
                    x = feats
                    if cfg.is_efficientnet:
                        x = jnp.repeat(x, 3, axis=-1)
                    all_probs.append(model(x))
                probs = sum(all_probs) / len(all_probs)
                track_probs = np.asarray(
                    _track_means(probs, plan.track_index, plan.n_tracks)
                )
                windows_per_track = np.bincount(
                    plan.track_index, minlength=plan.n_tracks
                )
                apply_thresholds(tracks, track_probs, windows_per_track, cfg)

    def _post(self, per_rec_tracks, all_tracks, n_valid, sr, B,
              meta_data=None, analyse_tracks=False):
        # host post-processing per recording
        results = []
        for b in range(B):
            length, signals, tracks = per_rec_tracks[b]
            bird_labels = set()
            for _, cfg in self.groups[0] + (self.groups[1] if len(self.groups) > 1 else []):
                bird_labels.update(cfg.bird_labels)
            # location metadata -> eBird filtering BEFORE master tags,
            # matching the single path's ordering (pipeline/analysis.py:43-47)
            if meta_data is not None and meta_data[b] is not None:
                filter_by_location(meta_data[b], tracks)
            for t in tracks:
                t.set_master_tag()
            if analyse_tracks:
                # per-track labels only — no chirps/cacophony block
                # (reference analyse.py:157-171 is gated on not analyse_tracks)
                results.append(
                    {
                        "non_bird_tags": NON_BIRD,
                        "species_identify": [t.get_meta() for t in tracks],
                        "species_identify_version": "2025-12-01",
                    }
                )
                continue
            rec_signals = [s.to_array() for s in signals]
            chirps = get_chirps(tracks, list(bird_labels), signals)
            cacophony_index, _ = calc_cacophony_index(filter_tracks(tracks), length)
            max_chirps = get_max_chirps(length)
            results.append(
                {
                    "duration": int(n_valid[b]) / sr,
                    "cacophony_index": cacophony_index,
                    "cacophony_index_version": "2.0",
                    "chirps": {
                        "chirps": chirps,
                        "max_chirps": max_chirps,
                        "chirp_index": 0 if max_chirps == 0 else round(100 * chirps / max_chirps),
                        "signals": rec_signals,
                    },
                    "non_bird_tags": NON_BIRD,
                    "species_identify": [t.get_meta() for t in tracks],
                    "species_identify_version": "2025-12-01",
                }
            )
        return results

    # -- internals ----------------------------------------------------------

    @staticmethod
    def _combine_plans(plans, t_bucket, base_row=0):
        """Merge per-recording plans into one global plan over [B*T] PCM.
        `base_row`: this process's first global recording row (multi-host)."""
        bases, vlo, vhi, tidx = [], [], [], []
        track_base = 0
        sample_size = plans[0].sample_size if plans else 0
        for b, plan in enumerate(plans):
            bases.append(plan.base.astype(np.int64) + (base_row + b) * t_bucket)
            vlo.append(plan.valid_lo)
            vhi.append(plan.valid_hi)
            tidx.append(plan.track_index + track_base)
            track_base += plan.n_tracks
            sample_size = plan.sample_size
        if not bases:
            return WindowPlan(
                base=np.zeros(0, np.int64),
                valid_lo=np.zeros(0, np.int32),
                valid_hi=np.zeros(0, np.int32),
                track_index=np.zeros(0, np.int32),
                n_tracks=0,
                sample_size=sample_size,
            )
        return WindowPlan(
            base=np.concatenate(bases),
            valid_lo=np.concatenate(vlo),
            valid_hi=np.concatenate(vhi),
            track_index=np.concatenate(tidx),
            n_tracks=track_base,
            sample_size=sample_size,
        )
