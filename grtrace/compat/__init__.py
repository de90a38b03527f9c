from .einsteinpy import Geodesic, Nulllike, Timelike
