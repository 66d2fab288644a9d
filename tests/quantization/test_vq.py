"""RVQ round-trip and EMA training-state tests (cf. reference
`tests/quantization/test_vq.py:20`)."""
import jax
import jax.numpy as jnp
import numpy as np

from audiocraft_tpu.quantization import ResidualVectorQuantizer, rvq_forward


def test_rvq_encode_decode_roundtrip():
    rvq = ResidualVectorQuantizer(dimension=16, n_q=4, bins=32, kmeans_init=False)
    state = rvq.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 16))
    codes = rvq.encode(state, x)
    assert codes.shape == (2, 4, 10)
    assert codes.dtype in (jnp.int32, jnp.int64)
    y = rvq.decode(state, codes)
    assert y.shape == x.shape
    # decode(encode(x)) equals the quantized forward output at eval time
    qres, _ = rvq.forward(state, x, frame_rate=50, training=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(qres.x), atol=1e-5)


def test_rvq_codes_are_exactly_decodable():
    """Quantized output must be the sum of per-level codebook vectors."""
    rvq = ResidualVectorQuantizer(dimension=8, n_q=2, bins=16, kmeans_init=False)
    state = rvq.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 8))
    codes = rvq.encode(state, x)
    manual = (np.asarray(state.codebooks.embed[0])[np.asarray(codes[:, 0])]
              + np.asarray(state.codebooks.embed[1])[np.asarray(codes[:, 1])])
    y = rvq.decode(state, codes)
    np.testing.assert_allclose(np.asarray(y), manual, atol=1e-5)


def test_rvq_training_updates_state_and_kmeans_init():
    rvq = ResidualVectorQuantizer(dimension=8, n_q=2, bins=8, kmeans_init=True,
                                  decay=0.9)
    state = rvq.init(jax.random.PRNGKey(0))
    assert not bool(state.codebooks.inited[0])
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 8))
    qres, new_state = rvq.forward(state, x, frame_rate=50, training=True,
                                  rng=jax.random.PRNGKey(2))
    assert bool(new_state.codebooks.inited[0])
    assert qres.penalty is not None
    # codebooks moved
    assert not np.allclose(np.asarray(new_state.codebooks.embed),
                           np.asarray(state.codebooks.embed))
    # second step keeps shapes and stays finite
    qres2, s2 = rvq.forward(new_state, x, frame_rate=50, training=True,
                            rng=jax.random.PRNGKey(3))
    assert np.isfinite(np.asarray(qres2.x)).all()


def test_rvq_ste_gradient_flows_to_input():
    rvq = ResidualVectorQuantizer(dimension=8, n_q=2, bins=8, kmeans_init=False)
    state = rvq.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 8))

    def loss(x):
        qres, _ = rvq.forward(state, x, frame_rate=50, training=True,
                              rng=jax.random.PRNGKey(2))
        return jnp.sum(jnp.square(qres.x)) + qres.penalty

    g = jax.grad(loss)(x)
    assert np.abs(np.asarray(g)).sum() > 0


def test_quantizer_dropout_masks_levels():
    rvq = ResidualVectorQuantizer(dimension=8, n_q=4, bins=8, kmeans_init=False,
                                  q_dropout=True)
    state = rvq.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8))
    qres, _ = rvq.forward(state, x, frame_rate=50, training=True,
                          rng=jax.random.PRNGKey(4))
    assert qres.codes.shape == (2, 4, 8)
    assert np.isfinite(float(qres.bandwidth))


def test_set_num_codebooks():
    rvq = ResidualVectorQuantizer(dimension=8, n_q=4, bins=8, kmeans_init=False)
    state = rvq.init(jax.random.PRNGKey(0))
    rvq.set_num_codebooks(2)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 8))
    codes = rvq.encode(state, x)
    assert codes.shape == (1, 2, 5)
