"""Version metadata (imsim/_version.py / meta_data.py role)."""
__version__ = "0.2.0"
__version_info__ = (0, 2, 0)
