"""Modality-signature scaling check: image_ahash, audio_fingerprint,
and video_scene_cuts over a replicated corpus at 1x/4x/16x.

What must hold for the 100 TB claim:
- wall time grows ~linearly with corpus size: the decode+signature
  stage is an Arrow-batched mapInPandas projection (cost ∝ payload
  bytes, embarrassingly parallel), and everything after it operates on
  TINY signature rows (one short string per image/clip, per-key
  windows for video) — no stage ever touches pairs;
- the banded near-pair join stays candidate-bounded: candidates and
  verified pairs are counted per step, and every replica's payloads
  are DISTINCT (synthesized from the full replica-unique id), so pair
  counts measure the blocking, not duplicate explosion.

Usage: python tools/multimodal_scale.py [replications_csv]  (default 1,4,16)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
REPS = (
    [int(x) for x in sys.argv[1].split(",")]
    if len(sys.argv) > 1
    else [1, 4, 16]
)


def main() -> None:
    from pyspark.sql import functions as F

    from applications_analytics_midas_hbase_metrics_spark.operators import (
        multimodal as MM,
    )
    from applications_analytics_midas_hbase_metrics_spark.session import get_spark

    spark = get_spark(app_name="mm-scale", cpus=32)
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    n_base = base.count()

    for rep in REPS:
        ids = base
        if rep > 1:
            ids = base.crossJoin(
                spark.range(rep).select(F.col("id").alias("_r"))
            ).select((F.col("doc_id") * rep + F.col("_r")).alias("doc_id"))
        ids = ids.repartition(32).localCheckpoint(eager=True)
        n = ids.count()

        t0 = time.time()
        imgs = MM.synthesize_bmp_payloads(ids).select("id", "payload")
        n_img = MM.image_ahash(imgs).filter(F.col("n_tiles") > 0).count()
        t_img = time.time() - t0

        t0 = time.time()
        clips = MM.synthesize_wav_payloads(ids).select("id", "payload")
        n_aud = (
            MM.audio_fingerprint(clips).filter(F.col("n_frames") > 0).count()
        )
        t_aud = time.time() - t0

        t0 = time.time()
        vids = MM.synthesize_video_payloads(ids).select("id", "payload")
        sc = MM.video_scene_cuts(vids).agg(
            F.count(F.lit(1)), F.sum("n_scenes")
        ).first()
        t_vid = time.time() - t0

        assert n_img == n and n_aud == n and sc[0] == n
        print(
            f"{rep:>2}x ({n} payloads/modality, base {n_base}):"
            f"  image_ahash {t_img:.1f}s  audio_fp {t_aud:.1f}s"
            f"  video_scenes {t_vid:.1f}s (total scenes {sc[1]})"
        )

    # Banded near-pair join at growing N.  The fixture BMPs are tiny
    # (<= 6-bit signatures), which makes EVERYTHING near-everything — a
    # data artifact that would read as quadratic blocking.  Real images
    # carry 64-bit signatures, so this block synthesizes 16x16 BMPs
    # (8x8 tile grid = 64 bits) with id-keyed random-ish content plus
    # ONE planted single-pixel variant per 10 base images: the expected
    # pair set is ~N/10 planted pairs (+ rare background collisions),
    # and wall/pair growth must stay ~linear.
    import numpy as np
    import pandas as pd_mod

    def big_bmps(ids_df):
        def run(batches):
            for pdf in batches:
                out = []
                for d in pdf["doc_id"]:
                    d = int(d)
                    base_id = d // 2
                    rng = np.random.RandomState(base_id % 2**31)
                    px = rng.randint(0, 256, size=(16, 16, 3)).astype(np.uint8)
                    if d % 2 == 1:
                        if base_id % 10 != 0:
                            continue  # variants only for every 10th base
                        px = px.copy()
                        px[0, 0, 0] ^= 0xFF  # one-pixel perturbation
                    out.append((d, MM.encode_bmp(px)))
                yield pd_mod.DataFrame(out, columns=["id", "payload"])

        return ids_df.mapInPandas(run, "id bigint, payload binary")

    for n in [2_000, 8_000, 32_000]:
        ids = spark.range(2 * n).select(F.col("id").alias("doc_id"))
        imgs = big_bmps(ids.repartition(32)).localCheckpoint(eager=True)
        n_imgs = imgs.count()
        t0 = time.time()
        n_pairs = MM.image_ahash_near_pairs(imgs, max_hamming=1).count()
        dt = time.time() - t0
        print(
            f"near-pairs N={n_imgs} (planted ~{n // 10}):"
            f"  {dt:.1f}s  verified_pairs={n_pairs}"
        )


if __name__ == "__main__":
    main()
