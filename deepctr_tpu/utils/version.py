"""Version freshness check — network-free by design.

The reference starts a background thread at import time that GETs PyPI
(deepctr_torch/utils.py:19-44, wired from __init__.py:6).  A silent
network call at import is the wrong default for production training
jobs (air-gapped pods, hermetic builds, surprise egress), so the parity
surface is kept but the transport is inverted: the deployment
environment PUSHES the known-latest version via
``DEEPCTR_TPU_LATEST_VERSION`` (e.g. set by the cluster launcher from
an internal index) and this check only compares and logs.  Without the
variable it is a no-op.
"""

import logging
import os

_logger = logging.getLogger(__name__)


def _parse(v):
    parts = []
    for tok in str(v).split("."):
        digits = "".join(ch for ch in tok if ch.isdigit())
        parts.append(int(digits) if digits else 0)
    return tuple(parts)


def check_version(version):
    """Log a notice when a newer version is known to the environment.

    (reference parity: deepctr_torch/utils.py:19-44 — same user-facing
    behavior, no import-time network I/O; see module docstring.)
    """
    latest = os.environ.get("DEEPCTR_TPU_LATEST_VERSION")
    if not latest:
        return None
    try:
        newer = _parse(latest) > _parse(version)
    except Exception:
        return None
    if newer:
        _logger.warning(
            "deepctr_tpu %s is installed but %s is available — upgrade "
            "for the latest models and fixes.", version, latest)
    return newer
