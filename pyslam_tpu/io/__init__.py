"""Dataset I/O: g2o / BAL / EuRoC / trajectory readers and synthetic
generators (SURVEY.md §7)."""

from . import bal, euroc, g2o, synth, trajectory  # noqa: F401
