"""DAS shared types: sampling positions + per-stage metrics.

Capability parity with myzkp/src/modules/das/utils.rs:4-66
(DataAvailabilitySystem trait, SamplePosition, SystemMetrics thread-local
store + reset_metrics).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class SamplePosition:
    row: int
    col: int
    is_row: bool


@dataclass
class SystemMetrics:
    encoding_time: float = 0.0
    commitment_time: float = 0.0
    proof_time: float = 0.0
    verification_time: float = 0.0
    reconstruction_time: float = 0.0
    encoded_size: int = 0
    commitment_size: int = 0
    proof_size: int = 0


METRICS = SystemMetrics()


def reset_metrics() -> None:
    global METRICS
    METRICS = SystemMetrics()


def get_metrics() -> SystemMetrics:
    return METRICS
