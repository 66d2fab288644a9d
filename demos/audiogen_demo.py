"""AudioGen CLI demo (counterpart of `demos/audiogen_demo.ipynb`).

    python demos/audiogen_demo.py --model debug "dog barking" "sirens passing"
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    parser = argparse.ArgumentParser(description="Generate sound from text")
    parser.add_argument("descriptions", nargs="+")
    parser.add_argument("--model", default="debug")
    parser.add_argument("--duration", type=float, default=5.0)
    parser.add_argument("--output", default="audiogen_out")
    args = parser.parse_args()

    from audiocraft_tpu.data.audio import audio_write
    from audiocraft_tpu.models import AudioGen

    model = AudioGen.get_pretrained(args.model)
    model.set_generation_params(duration=args.duration)
    wavs = model.generate(args.descriptions, progress=True)
    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)
    for desc, wav in zip(args.descriptions, np.asarray(wavs)):
        path = audio_write(out / desc.lower().replace(" ", "_")[:60],
                           wav, model.sample_rate)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
