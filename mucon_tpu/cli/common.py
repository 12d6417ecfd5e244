"""Shared CLI plumbing: --cfg/--set/--exp-name composition.

Mirrors the reference's fandak `common_config` click decorator surface
(train_test_mucon.py:14-27) with argparse (no click dependency in the
compute image is required, but the flags and composition order match).
"""

import argparse
import logging
from typing import List, Tuple

from mucon_tpu.config import ConfigNode, get_cfg_defaults, update_config


def config_arg_parser(description: str) -> argparse.ArgumentParser:
    # runs record which encoder path (Pallas kernel vs XLA) each trace
    # actually took — the decision is config- AND shape-dependent
    logging.getLogger("mucon_tpu").setLevel(logging.INFO)
    if not logging.getLogger().handlers:
        logging.basicConfig(
            level=logging.INFO, format="%(name)s: %(message)s"
        )
    p = argparse.ArgumentParser(description=description)
    p.add_argument(
        "--cfg",
        dest="file_configs",
        action="append",
        default=[],
        help="yaml config file override (repeatable)",
    )
    p.add_argument(
        "--set",
        dest="set_configs",
        nargs=2,
        action="append",
        default=[],
        metavar=("KEY", "VALUE"),
        help="dotted config override, e.g. --set dataset.split 2 (repeatable)",
    )
    p.add_argument("--exp-name", default="", help="experiment name override")
    return p


def compose_config(args) -> ConfigNode:
    flat_sets: List[str] = [x for pair in args.set_configs for x in pair]
    cfg = update_config(
        default_config=get_cfg_defaults(),
        file_configs=args.file_configs,
        set_configs=flat_sets,
    )
    if getattr(args, "exp_name", ""):
        cfg.defrost()
        cfg.experiment_name = args.exp_name
        cfg.freeze()
    # multihost runs: jax.distributed.initialize must run BEFORE any jax
    # call initializes the XLA backend (the entry scripts print
    # jax.devices() and build models long before the trainer constructs) —
    # initializing late raises RuntimeError, and skipping it silently runs
    # each host as an independent process_count==1 job writing the same
    # run folder.  auto=True also covers Cloud TPU pods, where the
    # coordinator comes from instance metadata rather than JAX_* env.
    if bool(getattr(cfg.tpu.mesh, "multihost", False)):
        from mucon_tpu.parallel.multihost import init_distributed

        init_distributed(auto=True)
    apply_runtime_config(cfg)
    return cfg


def apply_runtime_config(cfg) -> None:
    """Process-level JAX runtime knobs derived from the config.

    tpu.compilation_cache_dir: JAX's persistent compilation cache.
    Measured over the axon backend (scripts/probe_compile_cache_tpu.py):
    an 11.2 s compile collapses to 0.65 s in a FRESH process, Pallas
    programs included (Mosaic output is embedded in the cached
    executable). The timed full run's first epoch is 900-1300 s of
    compiles, so repeat runs at the same config skip nearly all of it."""
    cache_dir = str(getattr(cfg.tpu, "compilation_cache_dir", "") or "")
    if cache_dir:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        logging.getLogger("mucon_tpu").info(
            "persistent compilation cache: %s", cache_dir
        )
