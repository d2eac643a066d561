from .endofunctions import *
from .transform import *
