"""Analysis/synthesis windows (oracle, NumPy f64). SPEC.md §2.

Oracle counterpart of the reference's ``window.py`` (SURVEY.md §2 #6:
SineWindow/HanningWindow/KBDWindow). The oracle applies windows the
reference way — as functions multiplying a data block.
"""

from __future__ import annotations

import numpy as np


def sine_window(n: int) -> np.ndarray:
    return np.sin(np.pi * (np.arange(n) + 0.5) / n)


def hann_window(n: int) -> np.ndarray:
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * (np.arange(n) + 0.5) / n))


def kbd_window(n: int, alpha: float = 4.0) -> np.ndarray:
    h = n // 2
    j = np.arange(h + 1)
    kb = np.i0(np.pi * alpha * np.sqrt(np.clip(1.0 - (2.0 * j / h - 1.0) ** 2,
                                               0.0, 1.0)))
    csum = np.cumsum(kb)
    left = np.sqrt(csum[:h] / csum[h])
    return np.concatenate([left, left[::-1]])


def SineWindow(data: np.ndarray) -> np.ndarray:
    return data * sine_window(len(data))


def HanningWindow(data: np.ndarray) -> np.ndarray:
    return data * hann_window(len(data))


def KBDWindow(data: np.ndarray, alpha: float = 4.0) -> np.ndarray:
    return data * kbd_window(len(data), alpha)


def get_window(name: str, n: int, alpha: float = 4.0) -> np.ndarray:
    if name == "sine":
        return sine_window(n)
    if name == "hann":
        return hann_window(n)
    if name == "kbd":
        return kbd_window(n, alpha)
    raise ValueError(f"unknown window {name!r}")
