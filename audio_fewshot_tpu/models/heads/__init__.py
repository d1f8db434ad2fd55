"""Method (classifier) registry.

Reference exports: libfewshot_core/model/{metric,meta,finetuning}/__init__.py
(34 methods across three families).
"""

from . import proto_net  # noqa: F401
from . import meta_baseline  # noqa: F401
from . import dn4  # noqa: F401
from . import relation_net  # noqa: F401
from . import r2d2  # noqa: F401
from . import deepbdc  # noqa: F401
from . import maml  # noqa: F401
from . import finetuning  # noqa: F401
from . import pretrains  # noqa: F401
from . import local_metrics  # noqa: F401
from . import mcl  # noqa: F401
from . import kendall  # noqa: F401
from . import atl_net  # noqa: F401
from . import versa  # noqa: F401
from . import leo  # noqa: F401
from . import mtl  # noqa: F401
from . import metal  # noqa: F401
from . import ifsl  # noqa: F401
from . import can  # noqa: F401
from . import renet  # noqa: F401
from . import cpea  # noqa: F401
from . import feat  # noqa: F401
from . import frn  # noqa: F401
from . import dsn  # noqa: F401
