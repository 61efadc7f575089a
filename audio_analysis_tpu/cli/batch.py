"""Batch serving CLI: analyse many recordings through the warm
BatchAnalyzer (BASELINE config #5: batch of recordings -> per-track JSON).

Unlike the reference (one process per recording), this keeps models and
compiled programs warm, streams batches through the device pipeline, and
merges each result into its sidecar (or prints a JSON array with -o).

Usage:
  python -m audio_analysis_tpu.cli.batch [-o] --bird-model M [--bird-model M2]
      [--batch-size 8] [--seed N] FILE [FILE ...]
"""

import argparse
import json
import logging
import sys
import time

import numpy as np

from audio_analysis_tpu.cli.analyse import init_logging, none_or_str
from audio_analysis_tpu.io.audio import load_recording
from audio_analysis_tpu.io.metadata import jsdump, write_sidecar_result


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-o", "--meta-to-stdout", action="count")
    p.add_argument("--bird-model", type=none_or_str, action="append")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("files", nargs="+")
    args = p.parse_args(argv)
    if not args.bird_model:
        args.bird_model = [
            "/models/pre-model/audioModel.keras",
            "/models/bird-model-v2m/audioModel.keras",
        ]
    return args


def run(argv=None):
    from audio_analysis_tpu.pipeline.serve import BatchAnalyzer

    args = parse_args(argv)
    init_logging()
    t0 = time.time()
    rng = np.random.RandomState(args.seed) if args.seed is not None else np.random
    analyzer = BatchAnalyzer(args.bird_model, rng=rng)

    def batches():
        for i in range(0, len(args.files), args.batch_size):
            chunk = args.files[i : i + args.batch_size]
            recs = []
            for f in chunk:
                frames, _ = load_recording(f, resample=analyzer.sr, prefer_int16=True)
                recs.append(frames)
            yield chunk, recs

    all_results = []
    names = []
    stream = analyzer.analyse_stream((recs for _, recs in _tee_names(batches(), names)))
    for batch_results in stream:
        for fname, result in zip(names.pop(0), batch_results):
            result["processing_time_seconds"] = round(time.time() - t0, 1)
            all_results.append({"file": fname, "analysis": result})
            if not args.meta_to_stdout:
                write_sidecar_result(fname, result)
                logging.info("wrote sidecar for %s", fname)
    if args.meta_to_stdout:
        print(jsdump(all_results))
    return all_results


def _tee_names(gen, names_out):
    for chunk, recs in gen:
        names_out.append(chunk)
        yield chunk, recs


def main():
    try:
        run()
    except Exception:
        logging.error("Terminated with error", exc_info=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
