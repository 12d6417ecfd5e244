"""Fully-supervised train + Viterbi-test entry point.

The reference ships `MuConFullySupervised` (models.py:781-870) and
`GeneralFullySupervisedDataset` (general_dataset.py:176-207) without an
entry script; this makes the regime runnable end-to-end:

    python -m mucon_tpu.cli.train_test_mucon_full \
        --cfg my.yaml --set dataset.split 1 --exp-name my_exp
"""

from mucon_tpu.cli.train_test_mucon import main as _main


def main(argv=None):
    return _main(argv, supervision="full")


if __name__ == "__main__":
    main()
