from . import classify, flat, integrate, render
