"""placeholder"""
class Display:  # pragma: no cover
    display_fields = None
    display_probe = None
