# Hermetic CI environment (parity: the reference's Dockerfile builds, tests,
# then runs the JS suite — Dockerfile:1-26). Build from repo root:
#   docker build -t stark-perpetual-tpu .
# The image runs the CPU test suite (8 virtual devices, the same gate as
# scripts/ci.sh); TPU benchmarks run outside the container on real chips.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    gcc g++ cmake ninja-build make && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY requirements.txt .
RUN pip install --no-cache-dir -r requirements.txt

COPY . .
# Native fast-Pedersen extension (csrc/starkcrypto.c -> runtime/_starkcrypto.so).
RUN cmake -S . -B build -G Ninja && cmake --build build

RUN ./scripts/ci.sh
