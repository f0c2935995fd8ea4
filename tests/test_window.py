import numpy as np
import pytest

from tac.dsp.window import sine_window, hann_window, kbd_window, transition_windows


@pytest.mark.parametrize("n", [64, 256, 2048])
def test_sine_tdac_identity(n):
    """Princen–Bradley: w[n]^2 + w[n+H]^2 == 1 (SPEC.md §2)."""
    w = sine_window(n)
    h = n // 2
    np.testing.assert_allclose(w[:h] ** 2 + w[h:] ** 2, 1.0, atol=1e-14)


@pytest.mark.parametrize("n", [64, 256, 2048])
def test_kbd_tdac_identity(n):
    w = kbd_window(n, alpha=4.0)
    h = n // 2
    np.testing.assert_allclose(w[:h] ** 2 + w[h:] ** 2, 1.0, atol=1e-12)


def test_windows_symmetric():
    for w in (sine_window(128), hann_window(128), kbd_window(128)):
        np.testing.assert_allclose(w, w[::-1], atol=1e-14)


def test_hann_mean_power():
    w = hann_window(1024)
    np.testing.assert_allclose(np.mean(w**2), 0.375, atol=1e-12)


def test_transition_windows_tdac_with_neighbors():
    """START window overlap-adds perfectly against LONG on the left and the
    first SHORT block on the right (the TDAC cross-terms cancel by symmetry;
    here we check the squared-sum partition of unity in the overlap regions)."""
    n_long, n_short = 512, 64
    h_long, h_short = n_long // 2, n_short // 2
    start, stop = transition_windows(n_long, n_short, "sine")
    wl = sine_window(n_long)
    ws = sine_window(n_short)
    # left overlap: long's second half vs start's first half
    np.testing.assert_allclose(wl[h_long:] ** 2 + start[:h_long] ** 2, 1.0, atol=1e-12)
    # right overlap: start's falling short edge vs short window's rising edge
    flat = (h_long - h_short) // 2
    fall = start[h_long + flat:h_long + flat + h_short]
    np.testing.assert_allclose(fall ** 2 + ws[:h_short] ** 2, 1.0, atol=1e-12)
    # stop is the time reverse
    np.testing.assert_allclose(stop, start[::-1], atol=0)
