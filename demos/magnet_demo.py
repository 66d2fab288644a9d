"""MAGNeT CLI demo (counterpart of `demos/magnet_demo.ipynb`).

    python demos/magnet_demo.py --model debug "80s synth with a driving beat"
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    parser = argparse.ArgumentParser(
        description="Generate music/sound with masked non-AR decoding")
    parser.add_argument("descriptions", nargs="+")
    parser.add_argument("--model", default="debug")
    parser.add_argument("--duration", type=float, default=None,
                        help="defaults to the model's trained duration")
    parser.add_argument("--decoding-steps", type=int, nargs=4,
                        default=[20, 10, 10, 10])
    parser.add_argument("--output", default="magnet_out")
    args = parser.parse_args()

    from audiocraft_tpu.data.audio import audio_write
    from audiocraft_tpu.models import MAGNeT

    model = MAGNeT.get_pretrained(args.model)
    if args.duration is not None:
        model.set_generation_params(duration=args.duration,
                                    decoding_steps=args.decoding_steps)
    wavs = model.generate(args.descriptions, progress=True)
    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)
    for desc, wav in zip(args.descriptions, np.asarray(wavs)):
        path = audio_write(out / desc.lower().replace(" ", "_")[:60],
                           wav, model.sample_rate)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
