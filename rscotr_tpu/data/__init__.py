from rscotr_tpu.data import datasets  # noqa: F401 (registry side effects)
from rscotr_tpu.data.build import (build_dataloaders, build_datasets,
                                   build_iteration_strategy,
                                   build_multidataloader, load_data_cfg)
from rscotr_tpu.data.iteration_strategies import strategies_map
from rscotr_tpu.data.loader import (MultiDataLoader, PrefetchIterator,
                                    TaskDataLoader, collate_cls, collate_det,
                                    collate_seg)

__all__ = [
    "build_datasets", "build_dataloaders", "build_multidataloader",
    "build_iteration_strategy", "load_data_cfg", "strategies_map",
    "MultiDataLoader", "TaskDataLoader", "PrefetchIterator",
    "collate_cls", "collate_det", "collate_seg",
]
