"""Baseline unlearning driver — methods WITHOUT the saliency mask
(parity: Classification/main_forget.py:15-183; identical to main_random but
the method is dispatched mask-free, main_forget.py:135)."""

from __future__ import annotations

from salun.cli.main_random import run


def main(argv=None):
    return run(argv, use_mask=False)


if __name__ == "__main__":
    main()
