"""placeholder"""
class Simulation:  # pragma: no cover
    pass
