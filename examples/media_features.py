"""Media feature extraction through the decode_media injection seam.

    python examples/media_features.py

Shows the full multimodal codec contract end-to-end with a strict
decoder injected through the documented ``decoder=`` path:

  - payloads are opaque ``binary`` with typed metadata;
  - the decoder validates a magic header before "decoding" (a real
    deployment injects PIL/opencv/ffmpeg behind the same signature);
  - corrupt payloads become dead-letter rows (``error`` column), not
    job failures — at corpus scale corrupt files are a certainty;
  - clean rows carry the feature vector onward for indexing/dedup.

No image libraries ship in this environment, so the "decode" step is a
byte-level transform with the same failure behaviour a real codec has.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graphview_spark.operators.multimodal import decode_media
from graphview_spark.session import get_spark

PNG_MAGIC = b"\x89PNG"


def strict_png_decoder(payload: bytes, kind: str) -> list[float]:
    """A codec with real failure modes: wrong kind and missing magic
    header raise, valid payloads yield a 4-dim feature vector. Swap in
    ``PIL.Image.open`` + an embedding model behind this signature for a
    real deployment."""
    if kind != "image":
        raise ValueError(f"png decoder got kind={kind!r}")
    if not payload.startswith(PNG_MAGIC):
        raise ValueError("bad magic: not a PNG payload")
    body = payload[len(PNG_MAGIC):]
    if not body:
        raise ValueError("truncated payload")
    return [
        float(len(body)),
        sum(body) / len(body),
        float(body[0]),
        float(body[-1]),
    ]


def main() -> None:
    spark = get_spark("media-features", cpus=4)

    rows = [
        (1, "image", PNG_MAGIC + b"good-image-bytes"),
        (2, "image", b"JFIF-actually-a-jpeg"),   # wrong magic -> dead letter
        (3, "image", PNG_MAGIC),                 # truncated -> dead letter
        (4, "audio", b"RIFF-wav-bytes"),         # wrong kind -> dead letter
        (5, "image", PNG_MAGIC + b"another-good-one"),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )

    decoded = decode_media(media, decoder=strict_png_decoder)

    clean = decoded.filter("error IS NULL")
    dead = decoded.filter("error IS NOT NULL")

    print("-- decoded features --")
    clean.select(
        "media_id", F.round(F.element_at("feature", 2), 2).alias("mean_byte")
    ).show()
    print("-- dead-letter rows --")
    dead.select("media_id", "kind", "error").show(truncate=False)

    n_clean, n_dead = clean.count(), dead.count()
    print(f"decoded {n_clean} ok, {n_dead} dead-lettered of {len(rows)}")
    assert (n_clean, n_dead) == (2, 3)

    # ---- the same seam with a REAL codec on REAL bytes ----
    # stdlib `wave` decodes genuine 16-bit PCM WAV payloads — no
    # external library needed; PIL (if installed) does the same for PNG.
    import io
    import math
    import struct
    import wave as wave_mod

    from graphview_spark.operators.multimodal import wav_pcm16_decoder

    def wav_bytes(scale: float) -> bytes:
        buf = io.BytesIO()
        with wave_mod.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(b"".join(
                struct.pack("<h", int(12000 * math.sin(scale * i)))
                for i in range(800)
            ))
        return buf.getvalue()

    audio = spark.createDataFrame(
        [
            (10, "audio", wav_bytes(0.1)),
            (11, "audio", wav_bytes(0.4)),
            (12, "audio", b"RIFFgarbage"),       # corrupt -> dead letter
        ],
        "media_id long, kind string, payload binary",
    )
    adec = decode_media(audio, decoder=wav_pcm16_decoder)
    print("-- real WAV decode: [duration_s, rate, channels, rms, peak] --")
    adec.select(
        "media_id",
        F.round(F.element_at("feature", 1), 3).alias("dur_s"),
        F.round(F.element_at("feature", 4), 3).alias("rms"),
        "error",
    ).show(truncate=False)
    assert adec.filter("error IS NULL").count() == 2
    assert adec.filter("error IS NOT NULL").count() == 1

    try:
        from graphview_spark.operators.multimodal import pil_image_decoder
        from PIL import Image  # noqa: F401

        buf = io.BytesIO()
        Image.new("RGB", (8, 8), color=(100, 50, 25)).save(buf, format="PNG")
        img = spark.createDataFrame(
            [(20, "image", buf.getvalue())],
            "media_id long, kind string, payload binary",
        )
        decode_media(img, decoder=pil_image_decoder).show(truncate=False)
    except ImportError:
        print("(PIL not installed — PNG real-codec leg skipped cleanly)")


if __name__ == "__main__":
    main()
