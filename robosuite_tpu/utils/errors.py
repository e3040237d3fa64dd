"""Framework exceptions (reference utils/errors.py:1-22)."""


class robosuiteTPUError(Exception):
    """Base class for exceptions in this framework."""


# reference-compatible aliases
robosuiteError = robosuiteTPUError


class XMLError(robosuiteTPUError):
    """Error in the model specification (MJCF import or spec building)."""


class SimulationError(robosuiteTPUError):
    """Error occurring during simulation."""


class RandomizationError(robosuiteTPUError):
    """Error in placement or domain randomization sampling."""
