"""Mixed-supervision train + Viterbi-test entry point.

The reference ships `MuConMixedSupervision` (models.py:873-911) and
`GeneralMixedSupervisionDataset` (general_dataset.py:210-263) without an
entry script; this makes the regime runnable end-to-end.  The supervised
subset fraction comes from `dataset.mixed.full_supervision_percentage`:

    python -m mucon_tpu.cli.train_test_mucon_mixed \
        --set dataset.mixed.full_supervision_percentage 25.0
"""

from mucon_tpu.cli.train_test_mucon import main as _main


def main(argv=None):
    return _main(argv, supervision="mixed")


if __name__ == "__main__":
    main()
