"""Headline-bench credibility check: converted real-layout weights vs
random-init (VERDICT r2 #5).

bench.py initializes the musicgen-small LM directly in our layout. This
script instantiates the *reference torch* LMModel at the same shape
(dim 1024 / 24 layers / 16 heads, n_q=4, card=2048), converts its state
dict through `torch_port.convert_lm_state` — the exact path real released
checkpoints take — and times the same B-batch CFG decode once with the
converted params and once with same-shape random params. TPU compute time
is weight-value-independent, so the expected delta is noise; this run
pins that expectation to a measurement and proves the benched kernels are
the ones converted checkpoints execute (same pytree, shapes, dtypes).

Prints one JSON line:
  {"b": N, "dt_converted_s": ..., "dt_random_s": ..., "delta_pct": ...}

Measured 2026-08-17 (v5e, B=64): dt_converted=3.596s vs dt_random=3.594s —
delta 0.04%, i.e. noise. 178.0 audio-sec/sec/chip at this batch.
"""
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))

B = 64          # enough to saturate; keeps the torch-side build affordable
DURATION = 10.0
FRAME_RATE = 50
DIM, HEADS, LAYERS, N_Q, CARD = 1024, 16, 24, 4, 2048


def build_converted_params():
    import torch
    from tests._reference_harness import import_reference
    from audiocraft_tpu.utils import torch_port

    ref_lm = import_reference("models.lm")
    ref_cond = import_reference("modules.conditioners")
    ref_patterns = import_reference("modules.codebooks_patterns")
    torch.manual_seed(0)
    fuse2cond = {"cross": ["description"], "prepend": [], "sum": [],
                 "input_interpolate": []}
    with torch.no_grad():
        ref = ref_lm.LMModel(
            pattern_provider=ref_patterns.DelayedPatternProvider(n_q=N_Q),
            condition_provider=ref_cond.ConditioningProvider({}),
            fuser=ref_cond.ConditionFuser(fuse2cond=fuse2cond),
            n_q=N_Q, card=CARD, dim=DIM, num_heads=HEADS, num_layers=LAYERS,
            hidden_scale=4, norm_first=True, bias_proj=False, causal=True,
            cross_attention=True, custom=True, activation="gelu",
            bias_ff=False, bias_attn=False)  # released-checkpoint layout
    src = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    del ref
    params = torch_port.convert_lm_state(
        src, n_q=N_Q, num_layers=LAYERS, cross_attention=True,
        bias_proj=False, norm_first=True)
    return jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)


def main():
    from audiocraft_tpu.models import lm as lm_mod
    from audiocraft_tpu.models.lm import GenParams, LMModel
    from audiocraft_tpu.modules.conditioners import ConditionFuser
    from audiocraft_tpu.modules.patterns import DelayedPatternProvider

    model = LMModel(
        pattern_provider=DelayedPatternProvider(n_q=N_Q), conditioners={},
        fuser=ConditionFuser({"cross": ["description"], "prepend": [],
                              "sum": [], "input_interpolate": []}),
        n_q=N_Q, card=CARD, dim=DIM, num_heads=HEADS, num_layers=LAYERS,
        hidden_scale=4, norm_first=True, bias_proj=False, bias_ff=False,
        bias_attn=False, causal=True, cross_attention=True,
        dtype=jnp.bfloat16)

    converted = build_converted_params()
    # init with an explicit dummy cross tensor (no conditioners in-tree)
    seq0 = jnp.zeros((1, N_Q, 4), jnp.int32)
    ct0 = {"description": (jnp.zeros((1, 4, DIM), jnp.bfloat16),
                           jnp.ones((1, 4), jnp.int32))}
    random_p = model.init(jax.random.PRNGKey(0), seq0, ct0)
    random_p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), random_p)
    # same tree: the bench kernels ARE the converted-checkpoint kernels
    assert (jax.tree_util.tree_structure(converted)
            == jax.tree_util.tree_structure(random_p))
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(converted)[0],
            jax.tree_util.tree_flatten_with_path(random_p)[0]):
        assert a.shape == b.shape and a.dtype == b.dtype, pa

    cond = (jax.random.normal(jax.random.PRNGKey(3), (2 * B, 12, DIM),
                              jnp.bfloat16),
            jnp.ones((2 * B, 12), jnp.int32))
    ct = {"description": cond}
    gen = GenParams(use_sampling=True, temp=1.0, top_k=250, cfg_coef=3.0)
    checksum = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))

    def run(params, seed):
        t = lm_mod.generate(model, params, jax.random.PRNGKey(seed),
                            conditions=[], condition_tensors=ct,
                            num_samples=B,
                            max_gen_len=int(DURATION * FRAME_RATE), gen=gen,
                            cache_dtype=jnp.int8)
        return float(np.asarray(checksum(t)))

    def timeit(params):
        run(params, 0)  # compile / warm
        times = []
        for s in (1, 2, 3):
            t0 = time.time()
            run(params, s)
            times.append(time.time() - t0)
        return float(np.mean(times))

    dt_conv = timeit(converted)
    dt_rand = timeit(random_p)
    print(json.dumps({
        "b": B, "dt_converted_s": round(dt_conv, 3),
        "dt_random_s": round(dt_rand, 3),
        "delta_pct": round(100.0 * (dt_conv - dt_rand) / dt_rand, 2),
        "audio_sec_per_sec_converted": round(B * DURATION / dt_conv, 1),
    }))


if __name__ == "__main__":
    main()
