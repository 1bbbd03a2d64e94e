"""Closure-shipping helper for Python-UDF kernels.

cloudpickle serializes module-level functions BY REFERENCE (workers must
re-import the module), so any pandas-UDF closure that calls a kernel from
this package would fail on executors with ModuleNotFoundError unless the
package is installed/on PYTHONPATH there. Registering the kernel modules
for by-value pickling makes every UDF self-contained: the function code
rides inside the serialized task, which is the correct posture for a
library that users submit to arbitrary clusters without installing it on
every node.
"""

from __future__ import annotations

from types import ModuleType

from pyspark import cloudpickle


def ship_by_value(*modules: ModuleType) -> None:
    """Mark pure-Python kernel modules to be pickled by value into UDF
    closures. Idempotent; ignores already-registered modules."""
    for m in modules:
        try:
            cloudpickle.register_pickle_by_value(m)
        except Exception:
            # older cloudpickle or duplicate registration — both harmless
            pass
