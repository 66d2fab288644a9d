"""Gradio app for MusicGen-Style (counterpart of
`ref demos/musicgen_style_app.py`): text + audio-style conditioned
generation with double classifier-free guidance and the RVQ-bottleneck
style knobs (eval_q / excerpt length).

Requires `gradio`; headless use: `MusicGen.get_pretrained('style')` +
`set_style_conditioner_params` directly.

    python demos/musicgen_style_app.py --model debug-style --listen 0.0.0.0
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

try:
    import gradio as gr
except ImportError as e:  # pragma: no cover
    raise SystemExit("gradio is not installed in this image; drive "
                     "MusicGen.get_pretrained('style') directly") from e

import numpy as np

_MODEL = None


def load_model(name: str):
    global _MODEL
    if _MODEL is None or _MODEL.name != name:
        from audiocraft_tpu.models import MusicGen
        _MODEL = MusicGen.get_pretrained(name)
    return _MODEL


def predict(model_name, text, style, duration, cfg_coef, cfg_coef_beta,
            eval_q, excerpt_length):
    from audiocraft_tpu.modules.conditioners import WavCondition
    model = load_model(model_name)
    model.set_generation_params(
        duration=duration, cfg_coef=cfg_coef,
        cfg_coef_beta=cfg_coef_beta if cfg_coef_beta > 0 else None)
    model.set_style_conditioner_params(eval_q=int(eval_q),
                                       excerpt_length=excerpt_length)
    attributes, prompt = model._prepare_tokens_and_attributes([text], None)
    if style is not None:
        sr, wav = style
        wav = np.asarray(wav, np.float32) / 32768.0
        wav = wav[None] if wav.ndim == 1 else wav.T
        from audiocraft_tpu.data.audio_utils import convert_audio
        wav = np.asarray(convert_audio(wav[None], sr, model.sample_rate, 1))
        for attr in attributes:
            attr.wav["self_wav"] = WavCondition(
                wav, np.array([wav.shape[-1]]),
                sample_rate=[model.sample_rate], path=[None])
    tokens = model._generate_tokens(attributes, prompt, progress=False)
    audio = np.asarray(model.generate_audio(tokens))[0].T
    return model.sample_rate, (audio * 32767).astype(np.int16)


def ui(args):
    with gr.Blocks() as demo:
        gr.Markdown("# MusicGen-Style — text + audio-style conditioning")
        with gr.Row():
            text = gr.Textbox(label="Describe your music")
            model_name = gr.Textbox(label="Model", value=args.model)
        style = gr.Audio(sources=["upload"], type="numpy",
                         label="Style excerpt (optional)")
        with gr.Row():
            duration = gr.Slider(1, 30, value=10, label="Duration (s)")
            cfg = gr.Number(label="CFG", value=3.0)
            beta = gr.Number(label="Double-CFG beta (0 = off)", value=5.0)
        with gr.Row():
            eval_q = gr.Slider(1, 6, value=3, step=1,
                               label="Style bottleneck eval_q")
            excerpt = gr.Slider(1.5, 4.5, value=3.0,
                                label="Style excerpt length (s)")
        btn = gr.Button("Generate")
        audio = gr.Audio(label="Generated music")
        btn.click(predict,
                  inputs=[model_name, text, style, duration, cfg, beta,
                          eval_q, excerpt],
                  outputs=[audio])
    demo.launch(server_name=args.listen, server_port=args.port)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="debug-style")
    parser.add_argument("--listen", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=7860)
    ui(parser.parse_args())
