__version__ = "0.5.0"
__version_tuple__ = (0, 5, 0)
