"""Generate pinned DuckDB VALUES-literal oracles for the two multimodal
queries (audio features / video frame sampling).

The clips are deterministic functions of the doc ids
(functions/media.py::make_audio / make_video), so the expected feature
rows at the driver's correctness scale (sf0.01) are computable once and
pinned as a literal oracle — a feature-math regression then fails the
rows+schema+hash check instead of sliding through a rows-only count
(VERDICT r2 §missing 3). Floats are emitted with repr() (shortest
round-trip), which DuckDB parses back to the identical double.

Usage: python tools/gen_multimodal_oracle.py [sf_dir]
Prints two SQL blocks to paste into __spark_entry__.py.
"""

import sys

sys.path.insert(0, ".")


def _lit(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, int):
        return str(v)
    return "'" + str(v).replace("'", "''") + "'"


def values_sql(rows, columns, casts):
    body = ",\n  ".join(
        "(" + ", ".join(_lit(getattr(r, c)) for c in columns) + ")"
        for r in rows)
    sel = ", ".join(
        f"CAST({c} AS {casts[c]}) AS {c}" if c in casts else c
        for c in columns)
    cols = ", ".join(columns)
    return (f"SELECT {sel}\nFROM (VALUES\n  {body}\n) AS t({cols})")


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from infinitycrawler_spark.session import get_spark

    import __spark_entry__ as e

    spark = get_spark("gen-multimodal-oracle")
    audio = e.q_multimodal_audio(spark, sf).collect()
    video = e.q_multimodal_video(spark, sf).collect()

    a_cols = ["audio_id", "ok", "sample_rate", "channels", "duration_s",
              "rms", "zero_crossing_rate", "peak"]
    a_casts = {"audio_id": "VARCHAR", "ok": "VARCHAR",
               "sample_rate": "INT", "channels": "INT",
               "duration_s": "DOUBLE", "rms": "DOUBLE",
               "zero_crossing_rate": "DOUBLE", "peak": "DOUBLE"}
    v_cols = ["video_id", "ok", "frame_idx", "ts_s", "w", "h", "frame_bytes"]
    v_casts = {"video_id": "VARCHAR", "ok": "VARCHAR", "frame_idx": "INT",
               "ts_s": "DOUBLE", "w": "INT", "h": "INT",
               "frame_bytes": "INT"}

    image = e.q_multimodal_image(spark, sf).collect()
    i_cols = ["image_id", "ok", "w", "h", "fmt", "mean_r", "mean_g",
              "mean_b", "phash", "emb_norm"]
    i_casts = {"image_id": "VARCHAR", "ok": "VARCHAR", "w": "INT",
               "h": "INT", "fmt": "VARCHAR", "mean_r": "DOUBLE",
               "mean_g": "DOUBLE", "mean_b": "DOUBLE",
               "phash": "BIGINT", "emb_norm": "DOUBLE"}

    print("AUDIO_ORACLE = \"\"\"\n" + values_sql(audio, a_cols, a_casts)
          + "\n\"\"\"\n")
    print("VIDEO_ORACLE = \"\"\"\n" + values_sql(video, v_cols, v_casts)
          + "\n\"\"\"\n")
    print("IMAGE_ORACLE = \"\"\"\n" + values_sql(image, i_cols, i_casts)
          + "\n\"\"\"\n")

    resize = e.q_multimodal_resize(spark, sf).collect()
    r_cols = ["image_id", "w", "h", "n_bytes", "resized_phash"]
    r_casts = {"image_id": "VARCHAR", "w": "INT", "h": "INT",
               "n_bytes": "INT", "resized_phash": "BIGINT"}
    print("RESIZE_ORACLE = \"\"\"\n" + values_sql(resize, r_cols, r_casts)
          + "\n\"\"\"\n")

    # real on-disk formats (BMP / PNG / WAV) through the same operators
    bmp = e.q_multimodal_bmp(spark, sf).collect()
    print("BMP_ORACLE = \"\"\"\n" + values_sql(bmp, i_cols, i_casts)
          + "\n\"\"\"\n")
    png = e.q_multimodal_png(spark, sf).collect()
    print("PNG_ORACLE = \"\"\"\n" + values_sql(png, i_cols, i_casts)
          + "\n\"\"\"\n")
    wav = e.q_multimodal_wav(spark, sf).collect()
    print("WAV_ORACLE = \"\"\"\n" + values_sql(wav, a_cols, a_casts)
          + "\n\"\"\"\n")


if __name__ == "__main__":
    main()
