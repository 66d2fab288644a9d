"""Pattern algebra round-trip tests (cf. reference
`tests/modules/test_codebooks_patterns.py`): build then revert is the
identity on valid positions, for every provider."""
import jax.numpy as jnp
import numpy as np
import pytest

from audiocraft_tpu.modules.patterns import (
    CoarseFirstPattern, DelayedPatternProvider, MusicLMPattern,
    ParallelPatternProvider, UnrolledPatternProvider)

PROVIDERS = [
    lambda n_q: DelayedPatternProvider(n_q),
    lambda n_q: DelayedPatternProvider(n_q, delays=[0] * n_q),
    lambda n_q: DelayedPatternProvider(n_q, flatten_first=2),
    lambda n_q: DelayedPatternProvider(n_q, empty_initial=3),
    lambda n_q: ParallelPatternProvider(n_q),
    lambda n_q: UnrolledPatternProvider(n_q),
    lambda n_q: UnrolledPatternProvider(n_q, flattening=[0] + [1] * (n_q - 1)),
    lambda n_q: CoarseFirstPattern(n_q),
    lambda n_q: MusicLMPattern(n_q, group_by=2),
]


@pytest.mark.parametrize("provider_fn", PROVIDERS)
@pytest.mark.parametrize("n_q,T", [(2, 9), (4, 16)])
def test_build_revert_roundtrip(provider_fn, n_q, T):
    provider = provider_fn(n_q)
    pattern = provider.get_pattern(T)
    special = 999
    z = jnp.arange(1 * n_q * T, dtype=jnp.int32).reshape(1, n_q, T)
    seq, idx, mask_b = pattern.build_pattern_sequence(z, special)
    assert seq.shape[:2] == (1, n_q)
    # every masked-off position holds the special token
    np.testing.assert_array_equal(
        np.asarray(seq)[0][~mask_b], special)
    rev, _, mask_r = pattern.revert_pattern_sequence(seq, special)
    assert rev.shape == (1, n_q, T)
    # valid positions of the revert reproduce the original codes
    np.testing.assert_array_equal(np.asarray(rev)[0][mask_r],
                                  np.asarray(z)[0][mask_r])
    # delayed/parallel/coarse-first/musiclm cover every position
    if isinstance(provider, (DelayedPatternProvider, CoarseFirstPattern, MusicLMPattern)):
        assert mask_r.all()


def test_delayed_pattern_layout_example():
    """The canonical MusicGen delay example (`codebooks_patterns.py:305-320`)."""
    provider = DelayedPatternProvider(3)
    pattern = provider.get_pattern(4)
    special = -1
    z = jnp.asarray(np.tile(np.arange(1, 5), (3, 1))[None])  # [[1..4]]*3
    seq, _, _ = pattern.build_pattern_sequence(z, special)
    expected = np.array([
        [-1, 1, 2, 3, 4, -1, -1],
        [-1, -1, 1, 2, 3, 4, -1],
        [-1, -1, -1, 1, 2, 3, 4],
    ])
    np.testing.assert_array_equal(np.asarray(seq)[0], expected)
    assert pattern.max_delay == 2
    assert pattern.starts_with_special_token()


def test_revert_pattern_logits_shape():
    provider = DelayedPatternProvider(2)
    pattern = provider.get_pattern(5)
    S = len(pattern.layout)
    card = 7
    logits = jnp.zeros((3, card, 2, S - 1))  # model output skips nothing; S-1 steps
    values, _, mask = pattern.revert_pattern_logits(logits, float("nan"))
    assert values.shape == (3, card, 2, 5)


def test_valid_layout_truncates_max_delay():
    provider = DelayedPatternProvider(4)
    pattern = provider.get_pattern(10)
    assert len(pattern.valid_layout) == len(pattern.layout) - pattern.max_delay
    assert pattern.max_delay == 3


def test_get_first_step_with_timesteps():
    provider = DelayedPatternProvider(3)
    pattern = provider.get_pattern(6)
    # timestep 0 of codebook 0 appears at step 1 (step 0 = special token)
    assert pattern.get_first_step_with_timesteps(0, 0) == 1
    assert pattern.get_first_step_with_timesteps(0, 2) == 3
