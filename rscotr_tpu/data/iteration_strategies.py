"""Multi-task iteration strategies.

Capability-equivalent of the reference's six strategies
(/root/reference/mtl/data/iteration_strategies.py:13-257): each strategy is
called once per step and returns the index of the dataset to draw from.
``should_exhaust_all_iterators`` controls epoch semantics in the
MultiDataLoader (exhaust-all vs infinite reignition).

Determinism note (SURVEY.md §5.8): under data parallelism all hosts must
agree on the task each step; strategies here are driven by an explicit
numpy Generator seeded identically everywhere (the reference relies on
identical torch seeds; --diff-seed would desync it — we keep the strategy
RNG separate from the data RNG so per-host data seeds stay independent).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from rscotr_tpu.config.registry import STRATEGIES


class IterationStrategy:
    should_exhaust_all_iterators: bool = False

    def __init__(self, dataloaders: Dict[str, object], seed: int = 0,
                 **kwargs):
        self.dataloaders = dataloaders
        self.num = len(dataloaders)
        self.rng = np.random.Generator(np.random.PCG64(seed))

    def __call__(self) -> int:
        raise NotImplementedError

    def set_step(self, step: int) -> None:
        """Re-derive state for resume; default reseeds fold(seed, step)."""
        pass


@STRATEGIES.register_module(name="constant")
class ConstantIterationStrategy(IterationStrategy):
    should_exhaust_all_iterators = True

    def __init__(self, dataloaders, idx: int = 0, **kwargs):
        super().__init__(dataloaders, **kwargs)
        self._idx = idx

    def __call__(self) -> int:
        return self._idx


@STRATEGIES.register_module(name="round_robin")
class RoundRobinIterationStrategy(IterationStrategy):
    """The reference default (build.py:21-28 maps 'round_robin' first)."""

    def __init__(self, dataloaders, start_idx: int = 0, **kwargs):
        super().__init__(dataloaders, **kwargs)
        self._cur = start_idx

    def __call__(self) -> int:
        idx = self._cur
        self._cur = (self._cur + 1) % self.num
        return idx

    def set_step(self, step: int) -> None:
        self._cur = step % self.num


@STRATEGIES.register_module(name="repeated_sequence")
class RepeatedSequenceIterationStrategy(IterationStrategy):
    """Explicit index sequence, e.g. [1, 2, 2, 0, 0, 0]."""

    def __init__(self, dataloaders, sequence: Sequence[int] = (0,), **kwargs):
        super().__init__(dataloaders, **kwargs)
        self._seq = list(sequence)
        self._pos = 0

    def __call__(self) -> int:
        idx = self._seq[self._pos]
        self._pos = (self._pos + 1) % len(self._seq)
        return idx

    def set_step(self, step: int) -> None:
        self._pos = step % len(self._seq)


@STRATEGIES.register_module(name="random")
class RandomIterationStrategy(IterationStrategy):
    def __call__(self) -> int:
        return int(self.rng.integers(0, self.num))


@STRATEGIES.register_module(name="weighted_random")
class WeightedRandomIterationStrategy(IterationStrategy):
    def __init__(self, dataloaders, p: Optional[Sequence[float]] = None,
                 **kwargs):
        super().__init__(dataloaders, **kwargs)
        p = np.asarray(p if p is not None else [1.0] * self.num, np.float64)
        self._p = p / p.sum()

    def __call__(self) -> int:
        return int(self.rng.choice(self.num, p=self._p))


@STRATEGIES.register_module(name="size_proportional")
class SizeProportionalIterationStrategy(IterationStrategy):
    should_exhaust_all_iterators = True

    def __init__(self, dataloaders, **kwargs):
        super().__init__(dataloaders, **kwargs)
        sizes = np.asarray([len(dl.dataset) if hasattr(dl, "dataset")
                            else len(dl) for dl in dataloaders.values()],
                           np.float64)
        self._p = sizes / sizes.sum()

    def __call__(self) -> int:
        return int(self.rng.choice(self.num, p=self._p))


STRATEGIES.register_module(name="uniform_random",
                           module=RandomIterationStrategy, force=False)
STRATEGIES.register_module(name="size_weighted_random",
                           module=SizeProportionalIterationStrategy)
STRATEGIES.register_module(name="batch-weighted_random",
                           module=WeightedRandomIterationStrategy)

strategies_map = {
    "constant": ConstantIterationStrategy,
    "round_robin": RoundRobinIterationStrategy,
    "repeated_sequence": RepeatedSequenceIterationStrategy,
    "random": RandomIterationStrategy,
    "uniform_random": RandomIterationStrategy,
    "weighted_random": WeightedRandomIterationStrategy,
    "batch-weighted_random": WeightedRandomIterationStrategy,
    "size_proportional": SizeProportionalIterationStrategy,
    "size_weighted_random": SizeProportionalIterationStrategy,
}
