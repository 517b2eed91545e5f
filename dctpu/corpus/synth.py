"""Synthetic smart-meter load-profile generator (SURVEY.md §7 "No real corpus").

Generates int32 series with the statistical signatures of metered load data:
daily + weekly periodicity, base load, stochastic appliance spikes, measurement
noise, and an optional cumulative-register variant (monotone energy counter).
Seed-pinned so compression ratios are comparable across runs and machines.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

CADENCES = (60, 900, 3600)  # 1-min / 15-min / hourly [BASELINE.json configs]


def synth_stream(
    rng: np.random.Generator,
    n: int,
    cadence_s: int = 900,
    mean_w: float = 400.0,
    cumulative: bool = False,
) -> np.ndarray:
    """One load profile: instantaneous power in watts (or a cumulative register)."""
    t = np.arange(n, dtype=np.float64) * cadence_s
    day = 86400.0
    phase = rng.uniform(0, 2 * np.pi, size=3)
    daily = (
        0.6 * np.sin(2 * np.pi * t / day + phase[0])
        + 0.25 * np.sin(4 * np.pi * t / day + phase[1])
        + 0.15 * np.sin(2 * np.pi * t / (7 * day) + phase[2])
    )
    base = mean_w * (1.0 + 0.5 * daily)
    # appliance cycles: a few hundred watts switching on/off with dwell times
    n_appl = 3
    load = np.zeros(n)
    for _ in range(n_appl):
        power = rng.uniform(100, 2000)
        rate = rng.uniform(0.005, 0.05)  # toggles per sample
        state = rng.random(n) < rate
        onoff = np.cumsum(state) % 2
        load += power * onoff
    noise = rng.normal(0, mean_w * 0.01, size=n)
    watts = np.maximum(base + load + noise, 0.0)
    if cumulative:
        # energy register: cumulative watt-seconds / 3600 -> Wh counter
        wh = np.cumsum(watts * cadence_s / 3600.0)
        return np.minimum(wh, 2**31 - 1).astype(np.int32)
    return np.round(watts).astype(np.int32)


def synth_corpus(
    num_streams: int,
    samples_per_stream: int,
    seed: int = 0,
    mixed_cadence: bool = False,
    cumulative_frac: float = 0.2,
) -> Tuple[List[np.ndarray], List[int], List[int]]:
    """Returns (streams, stream_ids, cadences)."""
    rng = np.random.default_rng(seed)
    streams, ids, cads = [], [], []
    for i in range(num_streams):
        cad = CADENCES[i % len(CADENCES)] if mixed_cadence else 900
        cumulative = rng.random() < cumulative_frac
        streams.append(
            synth_stream(
                rng,
                samples_per_stream,
                cadence_s=cad,
                mean_w=float(rng.uniform(150, 1200)),
                cumulative=cumulative,
            )
        )
        ids.append(i)
        cads.append(cad)
    return streams, ids, cads
