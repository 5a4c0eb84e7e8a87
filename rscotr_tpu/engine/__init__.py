from rscotr_tpu.engine.checkpoint import (find_latest_checkpoint,
                                          load_checkpoint,
                                          resolve_checkpoint,
                                          save_checkpoint)
from rscotr_tpu.engine.hooks import (CheckpointHook, Hook, KeyIndicator,
                                     LogHook, MultiDatasetsEvalHook)
from rscotr_tpu.engine.optimizer import (MtlOptimizer, build_optimizer,
                                         make_lr_schedule,
                                         paramwise_multipliers,
                                         task_param_masks)
from rscotr_tpu.engine.runner import IterBasedRunner
from rscotr_tpu.engine.test import (adaptive_process_test,
                                    evaluate_results,
                                    multi_process_test,
                                    single_device_test)
from rscotr_tpu.engine.train_step import (TrainStepConfig, cls_batch_augment,
                                          make_infer_steps,
                                          make_scan_train_step,
                                          make_train_step, make_val_step,
                                          parse_losses)

__all__ = [
    "save_checkpoint", "load_checkpoint", "find_latest_checkpoint",
    "resolve_checkpoint",
    "Hook", "LogHook", "CheckpointHook", "KeyIndicator",
    "MultiDatasetsEvalHook", "MtlOptimizer", "build_optimizer",
    "make_lr_schedule", "paramwise_multipliers", "task_param_masks",
    "IterBasedRunner", "single_device_test", "multi_process_test",
    "adaptive_process_test",
    "evaluate_results",
    "TrainStepConfig", "make_train_step", "make_scan_train_step",
    "make_val_step", "make_infer_steps", "parse_losses",
    "cls_batch_augment",
]
