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
from mucon_tpu.data import handel_dataset
from mucon_tpu.harness import MuConEvaluator, SimpleTrainer
from mucon_tpu.models import create_model


def main(argv=None):
    args = config_arg_parser(__doc__).parse_args(argv)
    cfg = compose_config(args)
    print(cfg)
    print(f"jax devices: {jax.devices()}")

    train_db = handel_dataset(cfg, train=True)
    test_db = handel_dataset(cfg, train=False)

    model = create_model(
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

    trainer.train()
    trainer.save_training()

    # full evaluation with viterbi decoding
    test_evaluator.viterbi_mode(True)
    evaluator_result = test_evaluator.evaluate(trainer.params)
    print(evaluator_result)

    test_evaluator.set_checkpointing_folder(trainer._get_checkpointing_folder())
    test_evaluator.save_stuff()

    name = trainer.eval_metric_name_format.format(1)
    trainer.metrics[name].set_value(evaluator_result, trainer.epoch_num)
    trainer.metrics[name].save()
    return evaluator_result


if __name__ == "__main__":
    main()
