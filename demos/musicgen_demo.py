"""MusicGen CLI demo (counterpart of the reference's `demos/musicgen_demo.ipynb`).

    python demos/musicgen_demo.py --model debug --duration 4 \
        --output /tmp/mg_out "happy rock" "energetic EDM"
    python demos/musicgen_demo.py --model facebook/musicgen-melody \
        --melody path/to/ref.wav "whistling with acoustic guitar"
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    parser = argparse.ArgumentParser(description="Generate music from text")
    parser.add_argument("descriptions", nargs="+")
    parser.add_argument("--model", default="debug",
                        help="debug | debug-melody | debug-style | local checkpoint name")
    parser.add_argument("--duration", type=float, default=8.0)
    parser.add_argument("--melody", default=None,
                        help="optional melody-conditioning WAV")
    parser.add_argument("--top-k", type=int, default=250)
    parser.add_argument("--temperature", type=float, default=1.0)
    parser.add_argument("--cfg-coef", type=float, default=3.0)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--output", default="musicgen_out")
    args = parser.parse_args()

    from audiocraft_tpu.data.audio import audio_write
    from audiocraft_tpu.models import MusicGen

    model = MusicGen.get_pretrained(args.model)
    model.set_generation_params(duration=args.duration, top_k=args.top_k,
                                temperature=args.temperature,
                                cfg_coef=args.cfg_coef)
    if args.seed is not None:
        model.set_seed(args.seed)

    if args.melody is not None:
        from audiocraft_tpu.data.audio import audio_read
        melody, sr = audio_read(args.melody)
        wavs = model.generate_with_chroma(args.descriptions,
                                          np.asarray(melody)[None], sr,
                                          progress=True)
    else:
        wavs = model.generate(args.descriptions, progress=True)

    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)
    for desc, wav in zip(args.descriptions, np.asarray(wavs)):
        stem = out / desc.lower().replace(" ", "_")[:60]
        path = audio_write(stem, wav, model.sample_rate)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
