"""Resume-and-evaluate entry point.

Equivalent of the reference `src/test_mucon.py`: given an
`exp-name/run-number/epoch-number` identifier, reload the run folder's own
config.yaml, rebuild the model, restore the checkpoint, and run the full
Viterbi evaluation.

Usage:
    python -m mucon_tpu.cli.test_mucon my_exp/0/149 [--root R] [--data-root D]
"""

import argparse
from pathlib import Path

import jax

from mucon_tpu.config import get_cfg_defaults
from mucon_tpu.data import handel_dataset
from mucon_tpu.harness import MuConEvaluator
from mucon_tpu.harness.checkpoint import load_params
from mucon_tpu.models import create_model


def single_main(identifier: str, root: str = "", data_root: str = ""):
    print(identifier)
    cfg = get_cfg_defaults()
    if root == "":
        root = cfg.trainer.root

    exp_name, run_number, epoch_number = identifier.split("/")
    epoch_number = int(epoch_number)

    # the run folder is self-describing (test_mucon.py:41-43)
    run_folder = Path(root) / exp_name / f"{run_number}"
    cfg.merge_from_file(str(run_folder / "config.yaml"))

    if data_root == "":
        data_root = cfg.dataset.root
    cfg.defrost()
    cfg.trainer.root = root
    cfg.dataset.root = data_root
    cfg.freeze()

    test_db = handel_dataset(cfg, train=False)
    model = create_model(
        cfg=cfg,
        num_classes=test_db.get_num_classes(),
        max_decoding_steps=test_db.max_transcript_length + 1,
        input_feature_size=test_db.feat_dim,
    )

    test_evaluator = MuConEvaluator(
        cfg=cfg, test_db=test_db, model=model, device=cfg.system.device
    )
    test_evaluator.set_name("test_eval")
    test_evaluator.viterbi_mode(True)

    # read-only restore: no trainer, no new run folder, no optimizer init
    # (the reference's resume surface builds a full trainer; evaluation
    # must not allocate/modify run folders)
    params = load_params(
        root,
        exp_name,
        run_number,
        epoch_number,
        params_template=model.init_params(jax.random.PRNGKey(0)),
    )

    eval_result = test_evaluator.evaluate(params)
    print(eval_result)
    return eval_result


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("identifier", help="exp-name/run-number/epoch-number")
    p.add_argument("--root", default="")
    p.add_argument("--data-root", default="")
    args = p.parse_args(argv)
    return single_main(args.identifier, args.root, args.data_root)


if __name__ == "__main__":
    main()
