"""10x scale legs for the modality near-dup operators (round-7 VERDICT
item #6): image / audio / video near-dup candidates at the gated corpus
size and at 10x the BASES (constant cluster size 3 — a real 10x corpus
has 10x the duplicate groups, not 10x-bigger groups).

Two kinds of evidence per modality:

* wall time, best-of-N per leg (the stages are decode-dominated
  mapInArrow, so the expectation is ~linear; the host is noisy, so all
  samples are printed per CLAUDE.md);
* STRUCTURAL counters from hamming_band_bucket_stats — max band-bucket
  population, dropped-bucket count under the production cap
  (max_bucket=100), and the exact intermediate equi-join fan-out
  sum(C(m, 2)) over band buckets at both scales. Constant cluster size
  means fan-out grows ~linearly with N; a degenerate mega-bucket would
  show up as a DROPPED bucket (excluded before the join), never as a
  quadratic join — this is the proof the round-6 scale-killer shape is
  gone (VERDICT "What's wrong" #2).

Usage: python tools/modality_neardup_scale.py
  (one JSON line; quiet host; ~5 min)
  SPARK_GRAFT_MODALITY_SCALES="1,30" for a deeper leg (default "1,10").
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ATTEMPTS = int(os.environ.get("SPARK_GRAFT_BENCH_N", "2"))
CAP = 100


def _session():
    from bench import _mk_session
    spark = _mk_session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _leg(spark, media, cand_fn, sig_fn, hash_col, bits):
    """One (modality, scale) leg: timed candidate count + structural
    band-bucket counters under the production cap."""
    from rdf_rdfxml_spark.operators.multimodal import (
        hamming_band_bucket_stats,
    )
    samples = []
    n_pairs = None
    for _ in range(ATTEMPTS):
        t0 = time.time()
        n_pairs = cand_fn(media).count()
        samples.append(round(time.time() - t0, 3))
    sig = sig_fn(media).filter(f"{hash_col} IS NOT NULL")
    stats = hamming_band_bucket_stats(sig, hash_col, bits, n_bands=4,
                                      max_bucket=CAP).collect()
    joined = [r for r in stats if not r["dropped"]]
    return {
        "n_pairs": n_pairs,
        "wall_sec": min(samples),
        "samples": samples,
        "n_band_buckets": len(stats),
        "max_bucket": max(r["n_items"] for r in stats),
        "dropped_buckets": sum(1 for r in stats if r["dropped"]),
        # exact intermediate equi-join row count: sum of C(m,2) over
        # the buckets that actually reach the join
        "join_fanout_pairs": sum(
            r["n_items"] * (r["n_items"] - 1) // 2 for r in joined),
    }


def main():
    from rdf_rdfxml_spark.operators.multimodal import (
        DHASH_BITS, audio_fingerprints, audio_neardup_candidates,
        image_dhash, image_neardup_candidates, synth_neardup_audio,
        synth_neardup_media, synth_neardup_video,
        video_neardup_candidates, video_signatures,
    )
    spark = _session()
    spark.range(1000).selectExpr("sum(id)").collect()  # warm-up

    modalities = {
        "image": dict(
            synth=lambda n, nb: synth_neardup_media(spark, n, nb),
            cand=image_neardup_candidates, sig=image_dhash,
            hash_col="dhash", bits=DHASH_BITS, n1=48, nb1=16),
        "audio": dict(
            synth=lambda n, nb: synth_neardup_audio(spark, n, nb),
            cand=audio_neardup_candidates, sig=audio_fingerprints,
            hash_col="afp", bits=48, n1=36, nb1=12),
        "video": dict(
            synth=lambda n, nb: synth_neardup_video(spark, n, nb),
            cand=video_neardup_candidates, sig=video_signatures,
            hash_col="vhash", bits=DHASH_BITS, n1=24, nb1=8),
    }
    scales = [int(x) for x in os.environ.get(
        "SPARK_GRAFT_MODALITY_SCALES", "1,10").split(",")]
    hi = scales[-1]
    out = {"protocol": f"{scales[0]}x vs {hi}x bases (cluster size "
                       f"constant at 3), best-of-{ATTEMPTS}, cap={CAP}, "
                       f"local[{CPUS}]",
           "loadavg": round(os.getloadavg()[0], 2)}
    for name, m in modalities.items():
        legs = {}
        for scale in scales:
            n, nb = m["n1"] * scale, m["nb1"] * scale
            t0 = time.time()
            media = m["synth"](n, nb).repartition(2 * CPUS).persist()
            media.count()
            synth_sec = round(time.time() - t0, 3)
            legs[f"{scale}x"] = dict(
                n_items=n,
                synth_sec=synth_sec,  # driver-side generation, untimed
                **_leg(spark, media, m["cand"], m["sig"],
                       m["hash_col"], m["bits"]))
            media.unpersist()
        lo_k, hi_k = f"{scales[0]}x", f"{hi}x"
        w1, w10 = legs[lo_k]["wall_sec"], legs[hi_k]["wall_sec"]
        f1 = legs[lo_k]["join_fanout_pairs"]
        f10 = legs[hi_k]["join_fanout_pairs"]
        legs[f"wall_ratio_{hi_k}"] = round(w10 / w1, 2)
        legs[f"fanout_ratio_{hi_k}"] = (round(f10 / f1, 2)
                                        if f1 else None)
        out[name] = legs
        print(f"[scale] {name}: {legs[f'wall_ratio_{hi_k}']}x wall, "
              f"{legs[f'fanout_ratio_{hi_k}']}x join fan-out, "
              f"dropped={legs[hi_k]['dropped_buckets']}",
              file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
