"""Measured throughput + plumbing evidence for the multimodal pipeline.

The codec layer went real in rounds 8-9 (BMP/PNG/JPEG/WAV/AVI in stdlib +
numpy), which changes the pipeline's cost model: feature extraction now
DECODES instead of hashing. This probe records what that costs and that
the Spark-side plumbing still behaves:

1. codec micro-bench — decodes/s and decoded MB/s per format, local
   single-core (the per-payload function that ``mapInPandas`` fans out);
2. pipeline stage timings — ``extract_features`` / ``resize_media`` /
   ``sample_frames`` wall time and rows/s over a synthetic media table,
   plus JVM-side peak task memory and spill from the SQL metrics (the
   Python worker side is Arrow-batch bounded, see 3);
3. batch-bound invariance — the same extraction under
   ``spark.sql.execution.arrow.maxRecordsPerBatch=32`` returns identical
   features: batch memory is a config bound, not a correctness input;
4. partition invariance — features identical under 3 vs 16 partitions.

Usage: python tools/media_probe.py [--n 3000] [--out MEDIA_pipeline_probe.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

from tools.memory_audit import execution_memory  # noqa: E402
from tools.shuffle_audit import last_execution_id  # noqa: E402


def _codec_payloads() -> dict:
    from mapreduce_machine_learning_spark.sources.avi import encode_avi
    from mapreduce_machine_learning_spark.sources.gif import encode_gif
    from mapreduce_machine_learning_spark.sources.jpeg import (
        encode_jpeg,
        encode_jpeg_progressive,
    )
    from mapreduce_machine_learning_spark.sources.flac import encode_flac
    from mapreduce_machine_learning_spark.sources.ogg import encode_ogg_flac
    from mapreduce_machine_learning_spark.sources.multimodal import (
        encode_bmp,
        encode_png,
        encode_wav,
    )
    from mapreduce_machine_learning_spark.sources.webp import encode_webp
    from mapreduce_machine_learning_spark.sources.adpcm import (
        encode_wav_ima,
        encode_wav_ms,
    )
    from mapreduce_machine_learning_spark.sources.tiff import encode_tiff
    from mapreduce_machine_learning_spark.sources.y4m import encode_y4m
    from mapreduce_machine_learning_spark.sources.netpbm import encode_netpbm
    from mapreduce_machine_learning_spark.sources.mp4 import encode_mp4_mjpeg
    from mapreduce_machine_learning_spark.sources.tga import encode_tga

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (48, 64, 3)).astype(np.uint8)
    wav = (np.sin(np.linspace(0, 400, 8000)) * 9000).astype(np.int16)
    frames = [
        rng.integers(0, 256, (24, 32, 3)).astype(np.uint8) for _ in range(6)
    ]
    gif_pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    gif_frames = [
        rng.integers(0, 256, (24, 32)).astype(np.uint8) for _ in range(6)
    ]
    return {
        "bmp_48x64": encode_bmp(img),
        "png_48x64": encode_png(img),
        "jpeg_48x64_q90_420": encode_jpeg(img, 90, subsample=True),
        "jpeg_prog_48x64_q90_420": encode_jpeg_progressive(
            img, 90, subsample=True
        ),
        "gif_anim_6f_24x32": encode_gif(gif_frames, gif_pal),
        "webp_vp8l_48x64": encode_webp(img),
        "wav_8000x16bit": encode_wav(wav, 8000),
        "flac_8000x16bit": encode_flac(wav, 8000),
        "ogg_flac_8000x16bit": encode_ogg_flac(wav, 8000),
        "avi_dib_6f_24x32": encode_avi(frames, fps=10),
        "avi_mjpg_6f_24x32": encode_avi(frames, fps=10, codec="mjpg"),
        # round-13 codecs
        "tiff_lzw_pred_48x64": encode_tiff(
            img, compression="lzw", predictor=True
        ),
        "tiff_packbits_be_48x64": encode_tiff(
            img, compression="packbits", big_endian=True
        ),
        "wav_ima_adpcm_8000": encode_wav_ima(wav, 8000),
        "wav_ms_adpcm_8000": encode_wav_ms(wav, 8000),
        "y4m_420_6f_24x32": encode_y4m(
            np.stack(frames), fps=10, colorspace="420jpeg"
        ),
        "y4m_444_6f_24x32": encode_y4m(np.stack(frames), fps=10),
        "pnm_p6_48x64": encode_netpbm(img),
        "mp4_mjpeg_6f_24x32": encode_mp4_mjpeg(frames, fps=10),
        "tga_rle_48x64": encode_tga(img, rle=True),
    }


def codec_bench(reps: int = 50) -> dict:
    from mapreduce_machine_learning_spark.sources.multimodal import (
        features_for,
    )

    out = {}
    for name, payload in _codec_payloads().items():
        features_for(payload)  # warm (imports, first-call numpy paths)
        t0 = time.perf_counter()
        for _ in range(reps):
            features_for(payload)
        dt = time.perf_counter() - t0
        out[name] = {
            "payload_bytes": len(payload),
            "decodes_per_s": round(reps / dt, 1),
            "mb_per_s": round(len(payload) * reps / dt / 1e6, 2),
        }
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3000)
    ap.add_argument("--out", default="MEDIA_pipeline_probe.json")
    args = ap.parse_args()

    from mapreduce_machine_learning_spark.sources.native import (
        backend_report,
    )

    result = {
        "n_rows": args.n,
        # which codec path the dispatch resolves in THIS environment —
        # "pure-python" here (no Pillow/soundfile in the container);
        # a deployment with native backends shows them in this field
        "codec_backends": backend_report(),
        "codec_bench_1core": codec_bench(),
    }

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("mrml-media-probe")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from mapreduce_machine_learning_spark.sources.multimodal import (
        describe_media,
        extract_features,
        resample_media,
        resize_media,
        sample_frames,
        synth_media_real,
    )

    media = synth_media_real(spark, n=args.n).repartition(16)
    media.persist().count()  # isolate stage cost from synthesis cost
    # warm the Python workers (daemon fork + package import) so the
    # FIRST timed stage does not absorb one-time startup cost — stage
    # rows are meant to be comparable to each other
    describe_media(media).count()

    stages = {}
    for name, df in (
        # the catalog pass goes first and should be the CHEAPEST row —
        # that is its design claim (headers only, no sample decode)
        ("describe_media", describe_media(media)),
        ("extract_features", extract_features(media)),
        ("resize_media_32x24", resize_media(media, 32, 24)),
        ("sample_frames_4", sample_frames(media, 4)),
        ("resample_media_16000", resample_media(media, 16000)),
    ):
        t0 = time.perf_counter()
        n_out = df.count()
        wall = time.perf_counter() - t0
        mem = execution_memory(spark, last_execution_id(spark))
        stages[name] = {
            "rows_out": n_out,
            "wall_s": round(wall, 3),
            "input_rows_per_s": round(args.n / wall, 1),
            **mem,
        }
    result["stages"] = stages

    # invariance: partitioning and Arrow batch bound change NOTHING
    def fmap(df):
        return {
            r.media_id: tuple(r.features)
            for r in extract_features(df).collect()
        }

    base = fmap(media.repartition(16))
    result["partition_invariant"] = base == fmap(media.repartition(3))
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "32")
    result["arrow_batch_invariant"] = base == fmap(media.repartition(16))
    spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")

    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "codec_bench_1core"}))
    print("wrote", args.out)
    spark.stop()


if __name__ == "__main__":
    main()
