from .einsteinpy import Nulllike
