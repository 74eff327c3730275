"""Console-script entry points (``pyproject.toml [project.scripts]``).

Each CLI module keeps its argparse setup under ``if __name__ == "__main__"``
(mirroring the reference's per-script argparse layout, e.g.
``stylenet/train_multitask.py:560-633``); these shims re-run the module as a
main program so ``icee-train ...`` behaves exactly like
``python -m icee_tpu.cli.train ...``.
"""

import runpy


def _run(module: str) -> None:
    runpy.run_module(module, run_name="__main__")


def build_vocab() -> None:
    _run("icee_tpu.cli.build_vocab")


def train() -> None:
    _run("icee_tpu.cli.train")


def evaluate() -> None:
    _run("icee_tpu.cli.evaluate")


def validate() -> None:
    _run("icee_tpu.cli.validate")


def sample() -> None:
    _run("icee_tpu.cli.sample")


def export() -> None:
    _run("icee_tpu.cli.export")


def inspect_ckpt() -> None:
    _run("icee_tpu.cli.inspect_ckpt")


def precompute_features() -> None:
    _run("icee_tpu.cli.precompute_features")


def senticap_train() -> None:
    _run("icee_tpu.cli.senticap_train")


def caption_batch() -> None:
    _run("icee_tpu.cli.caption_batch")
