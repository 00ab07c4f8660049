#!/usr/bin/env python3
"""A reference-protocol transform plugin: drops rows whose single
Value is negative (the reference's test_filter.py shape). Implements
the line-delimited JSON-RPC stdio protocol with only the stdlib —
what plugins/transform.py does with pyjsonrpc."""
import json
import sys

state = {"options": {}, "sources": [], "destinations": [], "cols": {}}


def handle(method, param):
    if method == "set_option":
        state["options"][param["name"]] = param["value"]
        return ""
    if method == "set_sources":
        state["sources"] = param
        return ""
    if method == "set_destinations":
        state["destinations"] = param
        return ""
    if method == "set_input_columns":
        state["cols"][param["source"]] = param["columns"]
        return ""
    if method == "get_output_columns":
        return {"*": ["Value"]}
    if method == "receive":
        if not param:  # EOS
            return {}
        rows = [
            {"data": r["data"]}
            for r in param
            if r["data"] and r["data"][0] is not None and r["data"][0] >= 0
        ]
        return {"rows": rows}
    raise ValueError(f"unknown method {method}")


for line in sys.stdin:
    req = json.loads(line)
    try:
        result = handle(req["method"], req["params"][0] if req["params"] else None)
        resp = {"id": req["id"], "result": result, "error": None}
    except Exception as e:  # mirror the codec's error channel
        resp = {"id": req["id"], "result": None, "error": str(e)}
    sys.stdout.write(json.dumps(resp) + "\n")
    sys.stdout.flush()
