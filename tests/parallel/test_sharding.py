"""GSPMD sharding: rule inference, sharded train step, sharded generation
(8 virtual CPU devices from conftest)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _mesh():
    devices = jax.devices()[:8]
    return Mesh(np.array(devices).reshape(2, 2, 2), ("dp", "fsdp", "tp"))


def test_infer_shardings_covers_tree():
    from audiocraft_tpu.models.builders import get_debug_lm_model
    from audiocraft_tpu.parallel.sharding import infer_shardings
    model, params = get_debug_lm_model()
    shardings = infer_shardings(params, _mesh())
    leaves_p = jax.tree_util.tree_leaves(params)
    leaves_s = jax.tree_util.tree_leaves(
        shardings, is_leaf=lambda x: isinstance(x, NamedSharding))
    assert len(leaves_p) == len(leaves_s)
    assert all(isinstance(s, NamedSharding) for s in leaves_s)


def test_sharded_train_step_runs():
    from audiocraft_tpu.models.builders import get_debug_lm_model
    from audiocraft_tpu.models.lm import tokenize_conditions
    from audiocraft_tpu.modules.conditioners import ConditioningAttributes
    from audiocraft_tpu.solvers.musicgen import (init_train_state,
                                                 make_optimizer,
                                                 make_train_step,
                                                 state_shardings)
    mesh = _mesh()
    model, params = get_debug_lm_model()
    optimizer = make_optimizer(1e-4)
    state = init_train_state(model, params, optimizer)
    shardings = state_shardings(state, mesh)
    state = jax.device_put(state, shardings)
    step = make_train_step(model, optimizer, mesh)(shardings)
    attrs = [ConditioningAttributes(text={"description": "x"})
             for _ in range(4)]
    tokenized = tokenize_conditions(model, attrs)
    codes = jnp.zeros((4, model.n_q, 16), jnp.int32)
    mask = jnp.ones((4, 16), bool)
    state, metrics = step(state, codes, tokenized, mask,
                          jax.random.PRNGKey(0))
    assert np.isfinite(float(np.asarray(metrics["ce"])))


def test_sharded_generation_matches_replicated():
    """AR generate with GSPMD-sharded params == replicated greedy decode."""
    from audiocraft_tpu.models.builders import get_debug_lm_model
    from audiocraft_tpu.models import lm as lm_mod
    from audiocraft_tpu.models.lm import GenParams
    from audiocraft_tpu.modules.conditioners import ConditioningAttributes
    from audiocraft_tpu.parallel.sharding import infer_shardings

    model, params = get_debug_lm_model()
    params_sharded = jax.device_put(params, infer_shardings(params, _mesh()))
    attrs = [ConditioningAttributes(text={"description": "sharded"})] * 2
    gen = GenParams(use_sampling=False, top_k=0, cfg_coef=3.0)
    t_shard = lm_mod.generate(model, params_sharded, jax.random.PRNGKey(0),
                              conditions=attrs, max_gen_len=12, gen=gen)
    t_plain = lm_mod.generate(model, params, jax.random.PRNGKey(0),
                              conditions=attrs, max_gen_len=12, gen=gen)
    np.testing.assert_array_equal(np.asarray(t_shard), np.asarray(t_plain))


def test_sharded_train_step_runs_layer_scan():
    """layer_scan composes with GSPMD: the scanned train step runs under the
    dp x fsdp mesh and matches the unrolled sharded step's loss (the param
    stack is a pure gather inside the jitted program; shardings unchanged)."""
    import dataclasses
    from audiocraft_tpu.models.builders import get_debug_lm_model
    from audiocraft_tpu.models.lm import tokenize_conditions
    from audiocraft_tpu.modules.conditioners import ConditioningAttributes
    from audiocraft_tpu.solvers.musicgen import (init_train_state,
                                                 make_optimizer,
                                                 make_train_step,
                                                 state_shardings)
    mesh = _mesh()
    model, params = get_debug_lm_model()
    optimizer = make_optimizer(1e-4)
    attrs = [ConditioningAttributes(text={"description": "x"})
             for _ in range(4)]
    tokenized = tokenize_conditions(model, attrs)
    codes = jnp.zeros((4, model.n_q, 16), jnp.int32)
    mask = jnp.ones((4, 16), bool)

    ces = {}
    for tag, m in [("unrolled", model),
                   ("scan", dataclasses.replace(model, layer_scan=True))]:
        pc = jax.tree.map(jnp.array, params)
        state = init_train_state(m, pc, optimizer)
        shardings = state_shardings(state, mesh)
        state = jax.device_put(state, shardings)
        step = make_train_step(m, optimizer, mesh)(shardings)
        state, metrics = step(state, codes, tokenized, mask,
                              jax.random.PRNGKey(0))
        ces[tag] = float(np.asarray(metrics["ce"]))
    assert np.isfinite(ces["scan"])
    assert abs(ces["scan"] - ces["unrolled"]) < 1e-5
