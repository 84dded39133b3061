"""Evidence / marginal-likelihood estimation (BAT `bat_integrate` parity)."""
from tpuflows.integration.evidence import (
    EvidenceResult,
    log_evidence_bridge,
    log_evidence_harmonic,
    log_evidence_is,
)

__all__ = [
    "EvidenceResult",
    "log_evidence_bridge",
    "log_evidence_harmonic",
    "log_evidence_is",
]
