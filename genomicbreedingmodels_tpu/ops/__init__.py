from . import grm, linalg, metrics
