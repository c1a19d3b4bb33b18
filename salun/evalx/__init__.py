from .svc_mia import SVC_MIA, collect_prob
from .mia import BlackBoxBenchmarks
