"""Mixer: N demodulated inputs -> one (possibly stereo) mixed audio channel.

Semantic model of the reference mixer (reference: src/mixer.cpp) redesigned
for the block-synchronous TPU pipeline: instead of a free-running thread at
2x batch cadence, ``Mixer.poll()`` is called once per half-block interval by
the app loop, and emits a mixed [W] (or [W, 2] stereo) batch when every live
input has delivered or the deadline tolerance expires (mixer.cpp:142-156).

Per-input gain staging matches mixer_connect_input (mixer.cpp:81-85):
``ampl = min(1, 1-balance)``, ``ampr = min(1, 1+balance)``; any nonzero
balance switches the mixer to stereo.  The weighted sum itself
(mix_waveforms, mixer.cpp:133-140) is a vectorized masked accumulation —
with many inputs it is one [W, C] @ [C, 2] matmul, MXU-friendly if ever
moved on-device.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

MIX_DIVISOR = 2  # reference: rtl_airband.h MIX_DIVISOR


@dataclass
class MixInput:
    ampfactor: float = 1.0
    ampl: float = 1.0
    ampr: float = 1.0
    ready: bool = False
    has_signal: bool = False
    enabled: bool = True  # input_mask in the reference
    overrun_count: int = 0
    wavein: np.ndarray | None = None


@dataclass
class Mixer:
    name: str
    wave_batch: int
    stereo: bool = False
    enabled: bool = False
    inputs: list[MixInput] = field(default_factory=list)
    output_overrun_count: int = 0
    _interval: int = MIX_DIVISOR
    _todo: list[bool] = field(default_factory=list)
    _out_pending: bool = False  # CH_READY: previous output not yet consumed

    def connect_input(self, ampfactor: float = 1.0, balance: float = 0.0) -> int:
        """reference: mixer_connect_input (mixer.cpp:57-94)."""
        if not -1.0 <= balance <= 1.0:
            raise ValueError(f"mixer {self.name}: balance must be within [-1, 1]")
        inp = MixInput(
            ampfactor=ampfactor,
            ampl=min(1.0, 1.0 - balance),
            ampr=min(1.0, 1.0 + balance),
        )
        if balance != 0.0:
            self.stereo = True
        self.inputs.append(inp)
        self._todo.append(True)
        self.enabled = True
        return len(self.inputs) - 1

    def disable_input(self, idx: int) -> None:
        """reference: mixer_disable_input (mixer.cpp:96-112)."""
        self.inputs[idx].enabled = False
        if not any(i.enabled for i in self.inputs):
            self.enabled = False

    def put_samples(self, idx: int, samples: np.ndarray, has_signal: bool) -> None:
        """reference: mixer_put_samples (mixer.cpp:114-131)."""
        inp = self.inputs[idx]
        inp.has_signal = has_signal
        if has_signal:
            inp.wavein = np.asarray(samples, np.float32)
        if inp.ready:
            inp.overrun_count += 1
        else:
            inp.ready = True

    def output_consumed(self) -> None:
        """The app layer has taken the emitted batch (CH_READY -> CH_DIRTY)."""
        self._out_pending = False

    def poll(self) -> np.ndarray | None:
        """One mixer interval tick (call MIX_DIVISOR times per block period).

        Returns the mixed batch ([W] mono or [W, 2] stereo) when emitted,
        else None.  reference: mixer_thread body (mixer.cpp:170-258).
        """
        if not self.enabled:
            return None
        if self._out_pending:
            self._interval -= 1
            if self._interval > 0:
                return None
            self.output_overrun_count += 1
            self._out_pending = False

        # gather newly-ready live inputs
        for j, inp in enumerate(self.inputs):
            if self._todo[j] and inp.enabled and inp.ready:
                inp.ready = False
                self._todo[j] = False

        all_handled = not any(t and i.enabled for t, i in zip(self._todo, self.inputs))
        if not all_handled and self._interval > 0:
            self._interval -= 1
            return None

        # emit: vectorized mix_waveforms over all contributing inputs
        W = self.wave_batch
        cols = 2 if self.stereo else 1
        out = np.zeros((W, cols), np.float32)
        any_signal = False
        for inp in self.inputs:
            if inp.enabled and inp.has_signal and inp.wavein is not None:
                w = inp.wavein[:W]
                out[: len(w), 0] += w * (inp.ampfactor * inp.ampl)
                if self.stereo:
                    out[: len(w), 1] += w * (inp.ampfactor * inp.ampr)
                any_signal = True
        self.has_signal = any_signal
        self._interval = MIX_DIVISOR
        self._todo = [True] * len(self.inputs)
        self._out_pending = True
        return out[:, 0] if not self.stereo else out
