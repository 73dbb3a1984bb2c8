"""Physical execution of bound logical plans over the GDK-op kernel library
— the condensation of the reference's rel→MAL codegen + MAL interpreter
(sql/backends/monet5/rel_bin.c, monetdb5/mal/mal_interpreter.c): the plan
tree is walked bottom-up on the host, each node dispatching into the
property-driven jitted kernels of monetdb_tpu.ops."""

from .executor import Executor, Frame, Scalar  # noqa: F401
