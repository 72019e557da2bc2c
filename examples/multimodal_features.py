"""Multimodal feature pipeline demo — image, audio, and video columns
as opaque binary + typed metadata, decoded and featurized with REAL
in-container codecs (pure-stdlib PNG, WAV, animated GIF, AVI/RIFF, and
the pure-numpy baseline JPEG codec behind MJPEG-AVI).

Run: python examples/multimodal_features.py
"""

import sys

sys.path.insert(0, ".")

import numpy as np

from deva_spark.functions import multimodal as mm
from deva_spark.session import get_spark


def main() -> None:
    spark = get_spark("example-multimodal", cpus=8)
    rng = np.random.RandomState(42)

    # image: a real PNG (encoded by our own stdlib codec)
    img = rng.randint(0, 255, size=(24, 24, 3)).astype(np.uint8)
    png = mm.encode_png(img)

    # audio: a real 16-bit WAV sine burst
    import io
    import wave

    t = np.arange(8000) / 8000.0
    pcm = (np.sin(2 * np.pi * 440 * t) * 20000).astype("<i2")
    bio = io.BytesIO()
    with wave.open(bio, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(pcm.tobytes())
    wav = bio.getvalue()

    # video: a real animated GIF (4 frames, 3 colors)
    frames = (
        (rng.randint(0, 3, size=(4, 16, 16, 1)) * 100)
        .astype(np.uint8)
        .repeat(3, axis=3)
    )
    gif = mm.encode_gif(frames)

    rows = [
        (1, "image", png, {"width": 24, "height": 24, "n_frames": None,
                           "sample_rate": None, "mime": "image/png"}),
        (2, "audio", wav, {"width": None, "height": None, "n_frames": 8000,
                           "sample_rate": 8000, "mime": "audio/wav"}),
        (3, "video", gif, {"width": 16, "height": 16, "n_frames": 4,
                           "sample_rate": None, "mime": "image/gif"}),
    ]
    df = mm.media_table(spark, rows)

    meta = mm.extract_meta(df).select("media_id", "kind", "meta").collect()
    print(
        "sniffed metadata:",
        [(r.media_id, r.kind, r.meta.asDict()) for r in meta],
    )

    img_feats = (
        mm.decode_features(df.filter(df.kind == "image"), pool=4)
        .collect()[0]
        .features
    )
    print(f"image features ({len(img_feats)}): {[round(v, 3) for v in img_feats[:4]]}...")

    au = (
        mm.audio_features(df.filter(df.kind == "audio"), segments=8)
        .collect()[0]
        .features
    )
    print(f"audio RMS windows ({len(au)}): {[round(v, 3) for v in au[:4]]}...")

    vid = mm.video_features(
        df.filter(df.kind == "video"),
        decoder=mm.default_video_decoder(),  # GIF -> real stdlib codec
        pool=4,
        sample_every=1,
    ).collect()[0].features
    print(f"video pooled features ({len(vid)}): {[round(v, 3) for v in vid[:4]]}...")

    # MJPEG-in-AVI: every frame is a baseline JPEG from the package-own
    # pure-numpy codec; the same video_features stage decodes it with no
    # external library anywhere in the path (r11)
    clip = rng.randint(0, 255, size=(4, 16, 16, 3)).astype(np.uint8)
    avi = mm.encode_avi(clip, codec="mjpg", quality=92)
    mrows = [
        (4, "video", avi, {"width": 16, "height": 16, "n_frames": 4,
                           "sample_rate": None, "mime": "video/x-msvideo"}),
    ]
    mdf = mm.media_table(spark, mrows)
    mvid = mm.video_features(
        mdf, decoder=mm.default_video_decoder(), pool=4, sample_every=1
    ).collect()[0].features
    print(f"MJPEG-AVI pooled features ({len(mvid)}): {[round(v, 3) for v in mvid[:4]]}...")
    fr = mm.frame_sample(mdf, every_n=2).collect()
    print(
        "sampled AVI frames re-encoded as PNG:",
        [(r.frame_index, mm.png_dimensions(bytes(r.frame))) for r in fr],
    )
    spark.stop()


if __name__ == "__main__":
    main()
