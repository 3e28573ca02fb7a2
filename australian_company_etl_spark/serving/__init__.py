"""Serving layer: snapshot-publish + HTTP lookup service (reference parity:
fastapi_service/main.py)."""
