"""Codebook interleaving patterns for multi-codebook AR modeling.

Parity: `audiocraft/modules/codebooks_patterns.py:120-548` — Pattern layout
algebra (build/revert interleaved sequences and logits) plus the providers:
Delayed (MusicGen), Parallel (MAGNeT), Unrolled (flattening), CoarseFirst,
MusicLM.

TPU-first design: all layout -> scatter-index computation happens **host-side
in numpy** (LRU-cached per (timesteps, n_q) — it is pure index math), and the
device work is a single `jnp.take` gather per build/revert. Indexes are
compile-time constants under jit, so XLA lowers the gathers to cheap
dynamic-slices with static offsets.
"""
import logging
import typing as tp
from collections import namedtuple
from dataclasses import dataclass, field
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

LayoutCoord = namedtuple("LayoutCoord", ["t", "q"])  # (timestep, codebook index)
PatternLayout = tp.List[tp.List[LayoutCoord]]
logger = logging.getLogger(__name__)


@dataclass
class Pattern:
    """Interleaving pattern over a multi-codebook sequence.

    ``layout[s]`` lists the (t, q) coords present at sequence step ``s``; the
    first entry is usually an empty list so a special token starts the
    sequence. See `codebooks_patterns.py:22-58`.
    """
    layout: PatternLayout
    timesteps: int
    n_q: int

    def __post_init__(self):
        assert len(self.layout) > 0
        self._validate_layout()
        self._build_pattern_index_cache: dict = {}
        self._build_revert_index_cache: dict = {}

    def _validate_layout(self):
        """No duplicate codebooks per step; per-codebook timesteps ascend
        (`codebooks_patterns.py:57-77`)."""
        q_timesteps = {q: 0 for q in range(self.n_q)}
        for s, seq_coords in enumerate(self.layout):
            qs = set()
            for coord in seq_coords:
                qs.add(coord.q)
                last_q_timestep = q_timesteps[coord.q]
                assert coord.t >= last_q_timestep, \
                    f"Past timesteps are found in the sequence for codebook = {coord.q} at step {s}"
                q_timesteps[coord.q] = coord.t
            assert len(qs) == len(seq_coords), \
                f"Multiple entries for a same codebook are found at step {s}"

    @property
    def num_sequence_steps(self) -> int:
        return len(self.layout) - 1

    @property
    def max_delay(self) -> int:
        max_t_in_seq_coords = 0
        for seq_coords in self.layout[1:]:
            for coords in seq_coords:
                max_t_in_seq_coords = max(max_t_in_seq_coords, coords.t + 1)
        return max_t_in_seq_coords - self.timesteps

    @property
    def valid_layout(self) -> PatternLayout:
        valid_step = len(self.layout) - self.max_delay
        return self.layout[:valid_step]

    def starts_with_special_token(self) -> bool:
        return self.layout[0] == []

    def get_sequence_coords_with_timestep(self, t: int, q: tp.Optional[int] = None):
        """All (step, coord) pairs matching timestep t (and codebook q)."""
        assert t <= self.timesteps
        coords = []
        for s, seq_codes in enumerate(self.layout):
            for code in seq_codes:
                if code.t == t and (q is None or code.q == q):
                    coords.append((s, code))
        return coords

    def get_steps_with_timestep(self, t: int, q: tp.Optional[int] = None) -> tp.List[int]:
        return [step for step, coords in self.get_sequence_coords_with_timestep(t, q)]

    def get_first_step_with_timesteps(self, t: int, q: tp.Optional[int] = None) -> tp.Optional[int]:
        steps = self.get_steps_with_timestep(t, q)
        return steps[0] if steps else None

    # ------------------------------------------------------------------ build
    def _build_pattern_sequence_scatter_indexes(self, timesteps: int, n_q: int,
                                                keep_only_valid_steps: bool):
        """numpy indexes [K, S] into flattened [K*T + 1] input; mask [K, S]
        (`codebooks_patterns.py:120-152`)."""
        key = (timesteps, n_q, keep_only_valid_steps)
        if key in self._build_pattern_index_cache:
            return self._build_pattern_index_cache[key]
        assert n_q == self.n_q
        assert timesteps <= self.timesteps, \
            "invalid number of timesteps used to build the sequence from the pattern"
        ref_layout = self.valid_layout if keep_only_valid_steps else self.layout
        indexes = np.full((n_q, len(ref_layout)), n_q * timesteps, dtype=np.int32)
        mask = np.zeros((n_q, len(ref_layout)), dtype=bool)
        for s, sequence_coords in enumerate(ref_layout):
            for coords in sequence_coords:
                if coords.t < timesteps:
                    indexes[coords.q, s] = coords.t + coords.q * timesteps
                    mask[coords.q, s] = True
        self._build_pattern_index_cache[key] = (indexes, mask)
        return indexes, mask

    def build_pattern_sequence(self, z, special_token: int,
                               keep_only_valid_steps: bool = False):
        """[B, K, T] codes -> interleaved [B, K, S] + indexes + mask
        (`codebooks_patterns.py:154-179`)."""
        B, K, T = z.shape
        indexes, mask = self._build_pattern_sequence_scatter_indexes(
            T, K, keep_only_valid_steps)
        z = z.reshape(B, K * T)
        z = jnp.concatenate([z, jnp.full_like(z[:, :1], special_token)], axis=1)
        values = jnp.take(z, indexes.reshape(-1), axis=1).reshape(B, K, indexes.shape[-1])
        return values, indexes, mask

    # ----------------------------------------------------------------- revert
    def _build_reverted_sequence_scatter_indexes(self, sequence_steps: int, n_q: int,
                                                 keep_only_valid_steps: bool = False,
                                                 is_model_output: bool = False):
        """numpy indexes [K, T] into flattened [K*S + 1] sequence
        (`codebooks_patterns.py:180-223`)."""
        key = (sequence_steps, n_q, keep_only_valid_steps, is_model_output)
        if key in self._build_revert_index_cache:
            return self._build_revert_index_cache[key]
        ref_layout = self.valid_layout if keep_only_valid_steps else self.layout
        timesteps = self.timesteps
        assert n_q == self.n_q
        assert sequence_steps <= len(ref_layout), \
            f"sequence to revert is longer than the defined pattern: {sequence_steps} > {len(ref_layout)}"
        if is_model_output and self.starts_with_special_token():
            ref_layout = ref_layout[1:]
        indexes = np.full((n_q, timesteps), n_q * sequence_steps, dtype=np.int32)
        mask = np.zeros((n_q, timesteps), dtype=bool)
        for s, sequence_codes in enumerate(ref_layout):
            if s < sequence_steps:
                for code in sequence_codes:
                    if code.t < timesteps:
                        indexes[code.q, code.t] = s + code.q * sequence_steps
                        mask[code.q, code.t] = True
        self._build_revert_index_cache[key] = (indexes, mask)
        return indexes, mask

    def revert_pattern_sequence(self, s, special_token: int,
                                keep_only_valid_steps: bool = False):
        """Interleaved [B, K, S] -> original [B, K, T]
        (`codebooks_patterns.py:225-248`)."""
        B, K, S = s.shape
        indexes, mask = self._build_reverted_sequence_scatter_indexes(
            S, K, keep_only_valid_steps, is_model_output=False)
        s = s.reshape(B, K * S)
        s = jnp.concatenate([s, jnp.full_like(s[:, :1], special_token)], axis=1)
        values = jnp.take(s, indexes.reshape(-1), axis=1).reshape(B, K, indexes.shape[-1])
        return values, indexes, mask

    def revert_pattern_logits(self, logits, special_token: float,
                              keep_only_valid_steps: bool = False):
        """Model logits [B, card, K, S] -> [B, card, K, T]
        (`codebooks_patterns.py:250-271`); skips the initial special-token
        step so logits align with their targets."""
        B, card, K, S = logits.shape
        indexes, mask = self._build_reverted_sequence_scatter_indexes(
            S, K, keep_only_valid_steps, is_model_output=True)
        logits = logits.reshape(B, card, K * S)
        logits = jnp.concatenate(
            [logits, jnp.full_like(logits[:, :, :1], special_token)], axis=-1)
        values = jnp.take(logits, indexes.reshape(-1), axis=2)
        values = values.reshape(B, card, K, indexes.shape[-1])
        return values, indexes, mask


class CodebooksPatternProvider:
    """Pattern factory abstraction (`codebooks_patterns.py:272-296`)."""

    def __init__(self, n_q: int, cached: bool = True):
        assert n_q > 0
        self.n_q = n_q
        self.get_pattern = lru_cache(100)(self.get_pattern)  # type: ignore

    def get_pattern(self, timesteps: int) -> Pattern:
        raise NotImplementedError()


class DelayedPatternProvider(CodebooksPatternProvider):
    """MusicGen delay pattern (`codebooks_patterns.py:305-357`): codebook q is
    delayed by delays[q] steps (default q)."""

    def __init__(self, n_q: int, delays: tp.Optional[tp.List[int]] = None,
                 flatten_first: int = 0, empty_initial: int = 0):
        super().__init__(n_q)
        if delays is None:
            delays = list(range(n_q))
        self.delays = delays
        self.flatten_first = flatten_first
        self.empty_initial = empty_initial
        assert len(self.delays) == self.n_q
        assert sorted(self.delays) == self.delays

    def get_pattern(self, timesteps: int) -> Pattern:
        omit_special_token = self.empty_initial < 0
        out: PatternLayout = [] if omit_special_token else [[]]
        max_delay = max(self.delays)
        if self.empty_initial:
            out += [[] for _ in range(self.empty_initial)]
        if self.flatten_first:
            for t in range(min(timesteps, self.flatten_first)):
                for q in range(self.n_q):
                    out.append([LayoutCoord(t, q)])
        for t in range(self.flatten_first, timesteps + max_delay):
            v = []
            for q, delay in enumerate(self.delays):
                t_for_q = t - delay
                if t_for_q >= self.flatten_first:
                    v.append(LayoutCoord(t_for_q, q))
            out.append(v)
        return Pattern(out, n_q=self.n_q, timesteps=timesteps)


class ParallelPatternProvider(DelayedPatternProvider):
    """No-delay parallel pattern, used by MAGNeT
    (`codebooks_patterns.py:359-370`)."""

    def __init__(self, n_q: int, empty_initial: int = 0):
        super().__init__(n_q, [0] * n_q, empty_initial=empty_initial)


class UnrolledPatternProvider(CodebooksPatternProvider):
    """Flattened/unrolled pattern with optional per-codebook delays
    (`codebooks_patterns.py:372-491`)."""

    FlattenedCodebook = namedtuple("FlattenedCodebook", ["codebooks", "delay"])

    def __init__(self, n_q: int, flattening: tp.Optional[tp.List[int]] = None,
                 delays: tp.Optional[tp.List[int]] = None):
        super().__init__(n_q)
        if flattening is None:
            flattening = list(range(n_q))
        if delays is None:
            delays = [0] * n_q
        assert len(flattening) == n_q
        assert len(delays) == n_q
        assert sorted(flattening) == flattening
        assert sorted(delays) == delays
        self._flattened_codebooks = self._build_flattened_codebooks(delays, flattening)
        self.max_delay = max(delays)

    def _build_flattened_codebooks(self, delays: tp.List[int], flattening: tp.List[int]):
        flattened_codebooks: dict = {}
        for q, (inner_step, delay) in enumerate(zip(flattening, delays)):
            if inner_step not in flattened_codebooks:
                flat_codebook = self.FlattenedCodebook(codebooks=[q], delay=delay)
            else:
                flat_codebook = flattened_codebooks[inner_step]
                assert flat_codebook.delay == delay, (
                    "Delay and flattening between codebooks is inconsistent: ",
                    "two codebooks flattened to the same position should have the same delay."
                )
                flat_codebook.codebooks.append(q)
            flattened_codebooks[inner_step] = flat_codebook
        return flattened_codebooks

    @property
    def _num_inner_steps(self) -> int:
        return max(self._flattened_codebooks.keys()) + 1

    def num_virtual_steps(self, timesteps: int) -> int:
        return timesteps * self._num_inner_steps + 1

    def get_pattern(self, timesteps: int) -> Pattern:
        indexed_out: list = [(-1, [])]
        max_timesteps = timesteps + self.max_delay
        for t in range(max_timesteps):
            for step in range(self._num_inner_steps):
                if step in self._flattened_codebooks:
                    step_codebooks = self._flattened_codebooks[step]
                    t_for_q = t + step_codebooks.delay
                    coords = [LayoutCoord(t, q) for q in step_codebooks.codebooks]
                    if t_for_q < max_timesteps and t < max_timesteps:
                        indexed_out.append((t_for_q, coords))
                else:
                    indexed_out.append((t, []))
        out = [coords for _, coords in sorted(indexed_out)]
        return Pattern(out, n_q=self.n_q, timesteps=timesteps)


class CoarseFirstPattern(CodebooksPatternProvider):
    """All of codebook 0 first, then the rest (`codebooks_patterns.py:493-528`).

    Warning: generate the full training duration at test time — fine codebooks
    are non-causal wrt. the coarse ones.
    """

    def __init__(self, n_q: int, delays: tp.Optional[tp.List[int]] = None):
        super().__init__(n_q)
        if delays is None:
            delays = [0] * (n_q - 1)
        self.delays = delays
        assert len(self.delays) == self.n_q - 1
        assert sorted(self.delays) == self.delays

    def get_pattern(self, timesteps: int) -> Pattern:
        out: PatternLayout = [[]]
        for t in range(timesteps):
            out.append([LayoutCoord(t, 0)])
        max_delay = max(self.delays)
        for t in range(timesteps + max_delay):
            v = []
            for q, delay in enumerate(self.delays):
                t_for_q = t - delay
                if t_for_q >= 0:
                    v.append(LayoutCoord(t_for_q, q + 1))
            out.append(v)
        return Pattern(out, n_q=self.n_q, timesteps=timesteps)


class MusicLMPattern(CodebooksPatternProvider):
    """MusicLM-style grouped flattening (`codebooks_patterns.py:530-548`)."""

    def __init__(self, n_q: int, group_by: int = 2):
        super().__init__(n_q)
        self.group_by = group_by

    def get_pattern(self, timesteps: int) -> Pattern:
        out: PatternLayout = [[]]
        for offset in range(0, self.n_q, self.group_by):
            for t in range(timesteps):
                for q in range(offset, offset + self.group_by):
                    out.append([LayoutCoord(t, q)])
        return Pattern(out, n_q=self.n_q, timesteps=timesteps)
