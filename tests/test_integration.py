"""CI-adjacent form of the gated-connector verification (VERDICT r5 #6):
one pytest marker that drives ``examples/integration_roundtrip.py``
against the ``docker-compose.integration.yml`` stack when Kafka and
MySQL are actually reachable, turning S1-S4 from "gated, trust the
stand-in" into "gated, one command to verify".

In the sandbox (no broker, no MySQL, no driver jars) the test SKIPS
cleanly — and it is additionally deselected by default via
``addopts = -m "not integration"`` in pytest.ini. Outside, with the
compose stack up and the Kafka/MySQL packages on the classpath:

    docker compose -f docker-compose.integration.yml up -d
    python -m pytest -m integration tests/test_integration.py -q
"""

from __future__ import annotations

import os
import socket

import pytest


def _reachable(host: str, port: int, timeout: float = 1.5) -> bool:
    try:
        with socket.create_connection((host, port), timeout=timeout):
            return True
    except OSError:
        return False


def _endpoint(env: str, default_host: str, default_port: int) -> tuple[str, int]:
    raw = os.environ.get(env, "")
    if not raw:
        return default_host, default_port
    # accept host:port or a jdbc:mysql://host:port/... URL
    core = raw.split("://")[-1].split("/")[0].split("@")[-1]
    host, _, port = core.partition(":")
    return host or default_host, int(port) if port.isdigit() else default_port


@pytest.mark.integration
def test_connector_roundtrip_against_compose_stack():
    kafka_host, kafka_port = _endpoint(
        "INTEGRATION_KAFKA_BOOTSTRAP", "localhost", 9092
    )
    mysql_host, mysql_port = _endpoint("INTEGRATION_MYSQL_URL", "localhost", 3306)
    if not _reachable(kafka_host, kafka_port):
        pytest.skip(
            f"Kafka broker {kafka_host}:{kafka_port} unreachable — start "
            "docker-compose.integration.yml (expected in the sandbox)"
        )
    if not _reachable(mysql_host, mysql_port):
        pytest.skip(f"MySQL {mysql_host}:{mysql_port} unreachable")

    from examples.integration_roundtrip import main

    assert main() == 0
