"""Console-script entry points (pip package equivalents of the
reference's top-level run*.py scripts)."""

from __future__ import annotations

import os

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _run_script(name: str):
    path = os.path.join(_REPO, name)
    if os.path.exists(path):
        code = compile(open(path).read(), path, "exec")
        g = {"__name__": "__main__", "__file__": path}
        exec(code, g)
    else:  # installed package: import the module-level main
        raise SystemExit(f"script {name} not found at {path}")


def run_main():
    _run_script("run.py")


def video_main():
    _run_script("run_video.py")


def webcam_main():
    _run_script("run_webcam.py")


def train_main():
    _run_script("train.py")


def eval_main():
    _run_script("eval.py")


def convert_main():
    _run_script("convert.py")


def dataworker_main():
    _run_script("dataworker.py")
