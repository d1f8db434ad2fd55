"""Method (classifier) registry.

Reference exports: libfewshot_core/model/{metric,meta,finetuning}/__init__.py
(34 methods across three families).
"""

from . import proto_net  # noqa: F401
