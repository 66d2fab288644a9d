"""Gradio app for JASCO (counterpart of `ref demos/jasco_app.py`):
flow-matching music generation conditioned on text, chord progressions
and a drum-stem recording.

Requires `gradio`; headless use: `audiocraft_tpu.models.JASCO` directly
(see demos/jasco notebook / docs/JASCO.md).

    python demos/jasco_app.py --model debug --listen 0.0.0.0
"""
import argparse
import ast
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

try:
    import gradio as gr
except ImportError as e:  # pragma: no cover
    raise SystemExit("gradio is not installed in this image; drive "
                     "audiocraft_tpu.models.JASCO directly instead") from e

import numpy as np

_MODEL = None


def load_model(name: str):
    global _MODEL
    if _MODEL is None or _MODEL.name != name:
        from audiocraft_tpu.models import JASCO
        _MODEL = JASCO.get_pretrained(name)
    return _MODEL


def predict(model_name, text, chords_text, drums, cfg_all, cfg_txt):
    """chords_text: e.g. "[('C', 0.0), ('F', 2.0), ('G', 4.0)]"."""
    model = load_model(model_name)
    model.set_generation_params(cfg_coef_all=cfg_all, cfg_coef_txt=cfg_txt)
    chords = ast.literal_eval(chords_text) if chords_text.strip() else None
    drums_wav = None
    if drums is not None:
        sr, wav = drums
        wav = np.asarray(wav, np.float32) / 32768.0
        wav = wav[None] if wav.ndim == 1 else wav.T
        from audiocraft_tpu.data.audio_utils import convert_audio
        drums_wav = np.asarray(convert_audio(wav[None], sr,
                                             model.sample_rate, 1))
    out = model.generate([text], chords=chords, drums_wav=drums_wav)
    audio = np.asarray(out)[0].T
    return model.sample_rate, (audio * 32767).astype(np.int16)


def ui(args):
    with gr.Blocks() as demo:
        gr.Markdown("# JASCO — chords/drums conditioned generation")
        with gr.Row():
            text = gr.Textbox(label="Describe your music")
            model_name = gr.Textbox(label="Model", value=args.model)
        chords = gr.Textbox(
            label="Chord progression [(symbol, start_sec), ...]",
            value="[('C', 0.0), ('F', 4.0)]")
        drums = gr.Audio(sources=["upload"], type="numpy",
                         label="Drums recording (optional)")
        with gr.Row():
            cfg_all = gr.Number(label="CFG all", value=5.0)
            cfg_txt = gr.Number(label="CFG text", value=0.0)
        btn = gr.Button("Generate")
        audio = gr.Audio(label="Generated music")
        btn.click(predict,
                  inputs=[model_name, text, chords, drums, cfg_all, cfg_txt],
                  outputs=[audio])
    demo.launch(server_name=args.listen, server_port=args.port)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="debug")
    parser.add_argument("--listen", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=7860)
    ui(parser.parse_args())
