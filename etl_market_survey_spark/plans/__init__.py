"""Query plans: the driver-visible query registry lives in ``registry``."""
