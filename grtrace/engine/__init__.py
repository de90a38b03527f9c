from . import classify, flat, integrate, render
from . import euler
