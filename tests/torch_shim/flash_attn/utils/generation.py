class GenerationMixin:
    """Marker base class; the reference only inherits from it."""
