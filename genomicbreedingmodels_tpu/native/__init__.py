from .lib import load_native, native_available
