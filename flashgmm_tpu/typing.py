"""Type aliases (cf. compressai/typing)."""

from typing import Any, Callable, Dict, List, Tuple, Union

import jax

Array = jax.Array
PyTree = Any
StringList = List[bytes]
StringsLike = Union[List[bytes], Tuple[Any, ...]]
ShapeLike = Union[Tuple[int, ...], Dict[str, Any]]
ModuleFactory = Callable[..., Any]
