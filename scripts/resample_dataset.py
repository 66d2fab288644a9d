"""Resample a manifest's audio files to a target rate/channel count
(counterpart of the reference's `scripts/resample_dataset.py`), using the
native polyphase resampler in the data plane.

    python scripts/resample_dataset.py egs/music/train.jsonl /data/out \
        --sample-rate 32000 --channels 1
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    parser = argparse.ArgumentParser(description="Resample a dataset manifest")
    parser.add_argument("manifest", help="input .jsonl[.gz] manifest")
    parser.add_argument("out_root", help="output directory for resampled WAVs")
    parser.add_argument("--sample-rate", type=int, default=32000)
    parser.add_argument("--channels", type=int, default=1)
    parser.add_argument("--out-manifest", default=None,
                        help="defaults to <out_root>/data.jsonl")
    args = parser.parse_args()

    from audiocraft_tpu.data.audio import audio_read, audio_write
    from audiocraft_tpu.data.audio_dataset import (AudioMeta, load_audio_meta,
                                                   save_audio_meta)
    from audiocraft_tpu.data.audio_utils import convert_audio

    out_root = Path(args.out_root)
    out_root.mkdir(parents=True, exist_ok=True)
    metas = load_audio_meta(args.manifest)
    new_metas = []
    for i, meta in enumerate(metas):
        wav, sr = audio_read(meta.path)
        wav = convert_audio(np.asarray(wav)[None], sr, args.sample_rate,
                            args.channels)[0]
        stem = out_root / Path(meta.path).stem
        path = audio_write(stem, np.asarray(wav), args.sample_rate,
                           normalize=False)
        new_metas.append(AudioMeta(path=str(path),
                                   duration=wav.shape[-1] / args.sample_rate,
                                   sample_rate=args.sample_rate,
                                   amplitude=meta.amplitude,
                                   weight=meta.weight,
                                   info_path=meta.info_path))
        if (i + 1) % 100 == 0:
            print(f"{i + 1}/{len(metas)}")
    out_manifest = args.out_manifest or out_root / "data.jsonl"
    save_audio_meta(out_manifest, new_metas)
    print(f"wrote {len(new_metas)} entries to {out_manifest}")


if __name__ == "__main__":
    main()
