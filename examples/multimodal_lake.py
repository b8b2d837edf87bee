"""Runnable tour of the multimodal-lake side of the engine — binary
payload columns, strict stdlib codecs, and perceptual dedup, the way
examples/corpus_curation.py tours the text-curation side.

Builds a small mixed-media lake (real BMP / PNG / JPEG / GIF / WAV-PCM /
FLAC / WAV-ADPCM bytes synthesized from the documents table), sinks it as
one blob file per row, re-ingests it through Spark's ``binaryFile``
source, sniffs types, strict-decodes every payload to features, runs the
average-hash perceptual-dedup pass, and finishes on the VIDEO lane: a
mixed animated-GIF/Y4M lake transcoded to one container, frame-sampled,
and scanned for scene cuts. Every stage is an operator the oracle suite
verifies in isolation (mm_* entries); this script is the user-facing
composition.

    python examples/multimodal_lake.py [sf_dir]

Defaults to /root/testdata/sf0.001. Runs offline, nothing is downloaded.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import types as T

from big_data_project_spark import io
from big_data_project_spark.operators import dedup, multimodal
from big_data_project_spark.session import get_spark


def main(sf_dir: str) -> None:
    spark = get_spark("multimodal-lake-example")
    docs = io.load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs = docs.withColumn(
        "text", F.regexp_replace("text", "[^ -~]", "")
    )

    # --- 1. synthesize a mixed-media lake: seven REAL container formats --
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    jenc = multimodal._jpeg_codec()[0]
    genc = multimodal._gif_codec()[0]
    fenc = multimodal._flac_codec()[0]

    def build(it):
        import pandas as pd

        def bmp(b):
            return multimodal.make_bmp_24(
                [tuple(b[3 * i : 3 * i + 3]) for i in range(6)], 3, 2
            )

        def png(b):
            return multimodal.make_png_rgb8(
                [tuple(b[3 * i : 3 * i + 3]) for i in range(6)], 3, 2
            )

        def jpeg(b):
            px = [b[(y // 8) * 2 + (x // 8)] for y in range(16) for x in range(16)]
            return jenc(px, 16, 16, quant=[8] + [16] * 63)

        def gif(b):
            return genc([(v, v, v) for v in b[:12]], 3, 4)

        def wav(b):
            return multimodal.make_wav_pcm16([(c - 128) * 256 for c in b[:6]])

        def flac(b):
            return fenc([(c - 128) * 256 for c in b[:8]], 8000, 2,
                        subframe="fixed:2", stereo="left_side")

        def adpcm(b):
            return multimodal.make_wav_adpcm(
                [v for c in b[:4] for v in [(c - 128) * 256] * 9],
                8000,
                block_align=8,
            )

        builders = [bmp, png, jpeg, gif, wav, flac, adpcm]
        for pdf in it:
            rows = []
            for i, t in zip(pdf["doc_id"], pdf["text"]):
                b = ((t or "").encode() + b"x" * 18)[:18]
                rows.append({"doc_id": i, "payload": builders[i % 7](b)})
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    lake = docs.mapInPandas(build, out_schema)

    # --- 2. blob sink -> binaryFile source roundtrip ---------------------
    blob_dir = tempfile.mkdtemp(prefix="mm_lake_")
    multimodal.write_binary_files(lake, blob_dir)
    files = multimodal.read_binary_files(spark, blob_dir)
    ingested = files.select(
        F.regexp_extract("path", r"(\d+)\.bin$", 1).cast("long").alias("doc_id"),
        F.col("content").alias("payload"),
    )
    print(f"blob roundtrip: {ingested.count()} files via binaryFile source")

    # --- 3. sniff + strict decode (all codecs, stdlib only) --------------
    by_type = (
        multimodal.binary_stats(ingested)
        .groupBy("media_type")
        .count()
        .orderBy("media_type")
    )
    print("sniffed types:")
    for r in by_type.collect():
        print(f"  {r.media_type:28s} {r['count']}")

    feats = multimodal.decode_features(ingested, dim=8, decode="strict")
    print(f"strict-decoded features: {feats.count()} rows "
          f"(every payload through a real codec)")

    # --- 4. perceptual dedup over decoded features -----------------------
    hashes = multimodal.average_hash(feats, dim=8)
    groups = (
        hashes.groupBy("ahash")
        .agg(F.count("*").alias("n"), F.min("doc_id").alias("keeper"))
        .where(F.col("n") > 1)
    )
    n_groups = groups.count()
    print(f"perceptual near-dup groups (equal aHash): {n_groups}")
    if n_groups:
        sample = groups.orderBy(F.col("n").desc()).first()
        print(f"  largest group: {sample.n} payloads, keeper doc {sample.keeper}")

    # hamming-graded borderline pairs (fingerprints within 1 bit): the
    # same grading simhash dedup uses, here over perceptual hashes
    a = hashes.select(F.col("doc_id").alias("a"), F.col("ahash").alias("ha"))
    b = hashes.select(F.col("doc_id").alias("b"), F.col("ahash").alias("hb"))
    near = (
        a.join(b, F.col("a") < F.col("b"))
        .where(dedup.hamming_distance(F.col("ha"), F.col("hb")) <= 1)
    )
    print(f"borderline pairs (aHash hamming <= 1): {near.count()}")

    # --- 5. the VIDEO lane: mixed GIF/Y4M lake -> transcode -> frame
    #        sampling -> scene-cut detection --------------------------------
    genc_anim = multimodal._gif_codec()[2]
    y4m_enc = multimodal._y4m_codec()[0]

    def build_videos(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for i, t in zip(pdf["doc_id"], pdf["text"]):
                b = ((t or "").encode() + b"x" * 12)[:12]
                # 2 scenes x 2 frames: a planted cut at frame 2
                frames = [
                    [(v, v, v) for v in b[6 * (f // 2) : 6 * (f // 2) + 6]]
                    for f in range(4)
                ]
                blob = (
                    genc_anim(3, 2, frames, delays_cs=[4] * 4)
                    if i % 2 == 0
                    else y4m_enc(frames, 3, 2, rate=(25, 1))
                )
                rows.append({"doc_id": i, "payload": blob})
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    videos = docs.limit(64).mapInPandas(build_videos, out_schema)
    normalized = multimodal.transcode_videos(videos, target="y4m")
    print(
        "video lake normalized to Y4M: "
        f"{normalized.where(F.col('media_type') == 'video/y4m').count()} streams"
    )
    sampled = multimodal.sample_video_frames(
        normalized.select("doc_id", "payload"), every=1, dim=6
    )
    cuts = multimodal.detect_scene_cuts(sampled, threshold=1)
    n_cuts = cuts.where(F.col("is_cut")).count()
    print(f"scene cuts detected across sampled frames: {n_cuts}")

    # --- 6. the COMPRESSED-AUDIO lane: MP3 container stats (frame walk,
    #        duration, VBR detection) — the ingest-side triage that runs
    #        BEFORE any perceptual decode is needed ------------------------
    make_mp3 = multimodal.make_mp3_frames
    brs = multimodal.MP3_BITRATES_V1L3

    def build_mp3(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for i, t in zip(pdf["doc_id"], pdf["text"]):
                b = ((t or "").encode() + b"x" * 5)[:5]
                frames = [(brs[1 + c % 14], 44100, c % 2) for c in b]
                rows.append(
                    {"doc_id": i, "payload": make_mp3(frames, id3v1=i % 3 == 0)}
                )
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    mp3s = docs.limit(64).mapInPandas(build_mp3, out_schema)
    st = multimodal.mp3_stats(mp3s)
    agg = st.agg(
        F.count("*").alias("n"),
        F.sum("duration_us").alias("us"),
        F.sum(F.col("is_vbr")).alias("vbr"),
    ).collect()[0]
    print(
        f"mp3 lane: {agg.n} streams, {agg.us / 1e6:.2f}s total audio, "
        f"{agg.vbr} VBR"
    )

    # --- 7. PERCEPTUAL AUDIO DEDUP: the same clip re-encoded at half
    #        volume is a different byte string but the SAME audio —
    #        the energy-delta fingerprint reunites the pairs -------------
    mkwav = multimodal.make_wav_pcm16

    def build_wavs(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                pat = ((i // 2) * 2654435761) % 8192
                e, energies = 2000, [2000]
                for j in range(13):
                    e += 8 if (pat >> j) & 1 else -8
                    energies.append(e)
                scale = 2 if i % 2 else 1  # odd docs: half-volume re-encode
                samples = [
                    v for en in energies for v in (en // scale, 0, 0, 0)
                ]
                rows.append({"doc_id": i, "payload": mkwav(samples)})
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    wavs = docs.limit(64).select("doc_id").mapInPandas(build_wavs, out_schema)
    afeats = multimodal.decode_features(wavs, dim=56, decode="strict")
    fps = multimodal.audio_fingerprints(afeats, window=4)
    n_groups = fps.select("fingerprint").distinct().count()
    n_raw = wavs.select(F.md5(F.col("payload"))).distinct().count()
    print(
        f"audio dedup: {n_raw} distinct byte streams collapse to "
        f"{n_groups} perceptual groups (volume-invariant fingerprint)"
    )

    spark.stop()
    print("done.")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
