"""Gradio app for MAGNeT (counterpart of `ref demos/magnet_app.py`):
non-autoregressive masked-parallel text-to-music/sound with per-stage
decoding step controls.

Requires `gradio`; `demos/magnet_demo.py` covers headless environments.

    python demos/magnet_app.py --model debug --listen 0.0.0.0
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

try:
    import gradio as gr
except ImportError as e:  # pragma: no cover
    raise SystemExit(
        "gradio is not installed in this image; use demos/magnet_demo.py "
        "for the CLI demo") from e

import numpy as np

_MODEL = None


def load_model(name: str):
    global _MODEL
    if _MODEL is None or _MODEL.name != name:
        from audiocraft_tpu.models import MAGNeT
        _MODEL = MAGNeT.get_pretrained(name)
    return _MODEL


def predict(model_name, text, temperature, topp, max_cfg, min_cfg,
            steps_1, steps_2, steps_3, steps_4):
    model = load_model(model_name)
    model.set_generation_params(
        use_sampling=True, top_k=0, top_p=topp, temperature=temperature,
        max_cfg_coef=max_cfg, min_cfg_coef=min_cfg,
        decoding_steps=[int(steps_1), int(steps_2), int(steps_3),
                        int(steps_4)])
    out = model.generate([text])
    audio = np.asarray(out)[0].T
    return model.sample_rate, (audio * 32767).astype(np.int16)


def ui(args):
    with gr.Blocks() as demo:
        gr.Markdown("# MAGNeT — masked-parallel audio generation")
        with gr.Row():
            text = gr.Textbox(label="Describe your music/sound")
            model_name = gr.Textbox(label="Model", value=args.model)
        with gr.Row():
            temperature = gr.Number(label="Temperature", value=3.0)
            topp = gr.Number(label="Top-p", value=0.9)
            max_cfg = gr.Number(label="Max CFG", value=10.0)
            min_cfg = gr.Number(label="Min CFG", value=1.0)
        with gr.Row():
            s1 = gr.Number(label="Steps stage 1", value=20)
            s2 = gr.Number(label="Steps stage 2", value=10)
            s3 = gr.Number(label="Steps stage 3", value=10)
            s4 = gr.Number(label="Steps stage 4", value=10)
        btn = gr.Button("Generate")
        audio = gr.Audio(label="Generated audio")
        btn.click(predict,
                  inputs=[model_name, text, temperature, topp, max_cfg,
                          min_cfg, s1, s2, s3, s4],
                  outputs=[audio])
    demo.launch(server_name=args.listen, server_port=args.port)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="debug")
    parser.add_argument("--listen", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=7860)
    ui(parser.parse_args())
