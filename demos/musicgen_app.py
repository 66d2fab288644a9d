"""Gradio app for MusicGen (counterpart of `demos/musicgen_app.py`).

Requires `gradio`, which is not bundled in every image — the CLI demos
(`demos/musicgen_demo.py`) cover headless environments.

    python demos/musicgen_app.py --model debug --listen 0.0.0.0
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

try:
    import gradio as gr
except ImportError as e:  # pragma: no cover
    raise SystemExit(
        "gradio is not installed in this image; use demos/musicgen_demo.py "
        "for the CLI demo") from e

import numpy as np

_MODEL = None


def load_model(name: str):
    global _MODEL
    if _MODEL is None or _MODEL.name != name:
        from audiocraft_tpu.models import MusicGen
        _MODEL = MusicGen.get_pretrained(name)
    return _MODEL


def predict(model_name, text, melody, duration, topk, temperature, cfg_coef):
    model = load_model(model_name)
    model.set_generation_params(duration=duration, top_k=int(topk),
                                temperature=temperature, cfg_coef=cfg_coef)
    if melody is not None:
        sr, wav = melody
        wav = np.asarray(wav, np.float32) / 32768.0
        if wav.ndim == 1:
            wav = wav[None]
        else:
            wav = wav.T
        out = model.generate_with_chroma([text], wav[None], sr)
    else:
        out = model.generate([text])
    audio = np.asarray(out)[0].T  # [T, C]
    return model.sample_rate, (audio * 32767).astype(np.int16)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="debug")
    parser.add_argument("--listen", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=7860)
    args = parser.parse_args()

    demo = gr.Interface(
        fn=predict,
        inputs=[
            gr.Text(value=args.model, label="model"),
            gr.Text(label="describe your music"),
            gr.Audio(sources=["upload"], type="numpy",
                     label="melody (optional)"),
            gr.Slider(1, 30, value=8, label="duration (s)"),
            gr.Number(value=250, label="top-k"),
            gr.Slider(0.1, 2.0, value=1.0, label="temperature"),
            gr.Slider(0.0, 10.0, value=3.0, label="cfg coef"),
        ],
        outputs=gr.Audio(label="generated music"),
        title="MusicGen (TPU)",
    )
    demo.launch(server_name=args.listen, server_port=args.port)


if __name__ == "__main__":
    main()
