"""siren_ray: Ray-Data-native web-crawl / text-extraction engine."""
__version__ = "0.1.0"
