"""Minimal JSON-RPC 2.0 request encoder (parity: python/json_rpc/client.py)."""

import json
from typing import Any, Dict


class JsonRpcMethod:
    def __init__(self, name: str):
        self.name = name

    def call(self, *args, **kwargs) -> str:
        assert len(args) == 0, "JSON-RPC call can only contain named arguments."
        call_dict: Dict[str, Any] = {"jsonrpc": "2.0", "method": self.name, "id": None}
        if kwargs:
            call_dict["params"] = kwargs
        return json.dumps(call_dict)


class JsonRpcEncoder:
    def __getattr__(self, name: str) -> JsonRpcMethod:
        return JsonRpcMethod(name=name)
