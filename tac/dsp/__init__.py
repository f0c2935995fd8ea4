from tac.dsp.window import window_fn, sine_window, hann_window, kbd_window  # noqa: F401
from tac.dsp.mdct import (  # noqa: F401
    mdct_fft, imdct_fft, mdct_direct, imdct_direct,
    mdct_basis, imdct_basis, frame_signal, overlap_add, num_frames,
)
