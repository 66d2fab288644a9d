"""Extract per-file chord sequences for JASCO training data.

Parity: `reference scripts/chords/extract_chords.py` uses the Chordino vamp
plugin via the `chord_extractor` package (unavailable here). This version
ships a first-party template-matching estimator: chromagram (our matmul-DFT
ChromaExtractor) correlated against major/minor triad templates over 12
roots, with median smoothing and an 'N' (no-chord) state on low energy.
Output format is identical — one pickle per input file holding a list of
``(chord_label, timestamp_seconds)`` tuples — so `build_chord_maps.py` and
`data/jasco_dataset.py` consume either extractor's output.

Usage:
  python scripts/chords/extract_chords.py \
      --src_jsonl_file egs/example/data.jsonl --target_output_dir /tmp/chords
"""
import argparse
import json
import os
import pickle
import sys
from pathlib import Path

import numpy as np

# host-side data-plane job: never dispatch eager ops to a TPU tunnel
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

PITCHES = ["C", "Db", "D", "Eb", "E", "F", "Gb", "G", "Ab", "A", "Bb", "B"]


def chord_templates() -> tuple:
    """24 binary triad templates (12 maj + 12 min), L2-normalized."""
    labels = []
    templates = []
    for root in range(12):
        for kind, intervals in (("", (0, 4, 7)), ("m", (0, 3, 7))):
            t = np.zeros(12)
            for iv in intervals:
                t[(root + iv) % 12] = 1.0
            labels.append(PITCHES[root] + kind)
            templates.append(t / np.linalg.norm(t))
    return labels, np.stack(templates)  # [24, 12]


def extract_file_chords(path: str, frame_sec: float = 0.5,
                        energy_floor: float = 1e-4) -> list:
    """[(chord, time)] for one audio file."""
    import jax.numpy as jnp

    from audiocraft_tpu.data.audio import audio_read
    from audiocraft_tpu.modules.chroma import ChromaExtractor

    wav, sr = audio_read(path)
    extractor = ChromaExtractor(sample_rate=sr, n_chroma=12, radix2_exp=14)
    chroma = np.asarray(extractor(jnp.asarray(wav[None])))[0]  # [F, 12]
    hop_sec = extractor.winhop / sr
    # aggregate frames to ~frame_sec resolution
    group = max(int(round(frame_sec / hop_sec)), 1)
    n = chroma.shape[0] // group
    if n == 0:
        return [("N", 0.0)]
    grouped = chroma[:n * group].reshape(n, group, 12).mean(axis=1)
    energy = grouped.sum(axis=-1)
    norm = grouped / np.maximum(
        np.linalg.norm(grouped, axis=-1, keepdims=True), 1e-12)
    labels, templates = chord_templates()
    scores = norm @ templates.T  # [n, 24]
    best = np.argmax(scores, axis=-1)
    # median smoothing over 3 windows suppresses single-frame flips
    if len(best) >= 3:
        sm = best.copy()
        for i in range(1, len(best) - 1):
            tri = sorted(best[i - 1:i + 2])
            sm[i] = tri[1]
        best = sm
    out = []
    prev = None
    for i, b in enumerate(best):
        label = "N" if energy[i] < energy_floor else labels[int(b)]
        if label != prev:
            out.append((label, round(i * group * hop_sec, 3)))
            prev = label
    return out or [("N", 0.0)]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--src_jsonl_file", type=str, required=True,
                        help="jsonl manifest with a 'path' field per line "
                             "(or one absolute path per line)")
    parser.add_argument("--target_output_dir", type=str, required=True)
    parser.add_argument("--override", action="store_true")
    parser.add_argument("--frame_sec", type=float, default=0.5)
    args = parser.parse_args()

    os.makedirs(args.target_output_dir, exist_ok=True)
    files = []
    with open(args.src_jsonl_file) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                files.append(json.loads(line)["path"])
            except (json.JSONDecodeError, TypeError, KeyError):
                files.append(line)
    for path in files:
        stem = Path(path).stem
        out_path = Path(args.target_output_dir) / f"{stem}.chords"
        if out_path.exists() and not args.override:
            continue
        sequence = extract_file_chords(path, frame_sec=args.frame_sec)
        with open(out_path, "wb") as f:
            pickle.dump(sequence, f)
        print(f"{stem}: {len(sequence)} chord segments")


if __name__ == "__main__":
    main()
