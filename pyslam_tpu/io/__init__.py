"""Dataset I/O: g2o / BAL readers and synthetic generators (SURVEY.md §7)."""

from . import bal, g2o, synth, trajectory  # noqa: F401
