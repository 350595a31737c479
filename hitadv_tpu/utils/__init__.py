"""Shared utilities: logging, meters, checkpoint IO, PRNG policy."""

from hitadv_tpu.utils.logging import AvgMeter, create_logger  # noqa: F401
