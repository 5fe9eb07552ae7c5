#!/usr/bin/env python3
"""Syntactic CUDA-launch rewriter for executing unmodified reference .cu
kernels on the host.

Reads a reference ``.cu`` translation unit and rewrites ONLY the
``kernel<<<grid, block>>>(args);`` launch statements (a CUDA language
extension g++ cannot parse) into calls to the serial/threaded emulation
driver in ``cuda_emu.h``:

    kernel<<<g, b>>>(a, b, c);
        -> ::cuda_emu::launch_serial(g, b, [&]{ kernel(a, b, c); });
    (or launch_block_threads when the kernel body uses __syncthreads(),
     which requires all threads of a block to be live concurrently)

Everything else in the file — kernel bodies, the Forward_gpu member
functions, thrust calls — passes through byte-for-byte; the kernel-language
keywords (__global__/__device__/__shared__) and builtins (threadIdx, ...)
are handled by macros/globals in cuda_emu.h, not by rewriting.

Usage: cu_preprocess.py <in.cu> <out.cc>
"""
import re
import sys


def kernel_uses_syncthreads(src: str, name: str) -> bool:
    """True if __global__ kernel `name`'s body contains __syncthreads."""
    m = re.search(r"__global__\s+void\s+" + re.escape(name) + r"\b", src)
    if not m:
        return False
    i = src.index("{", m.end())
    depth = 0
    for j in range(i, len(src)):
        if src[j] == "{":
            depth += 1
        elif src[j] == "}":
            depth -= 1
            if depth == 0:
                return "__syncthreads" in src[i:j]
    return False


def match_paren(src: str, i: int) -> int:
    """Index just past the ')' matching the '(' at src[i]."""
    assert src[i] == "("
    depth = 0
    for j in range(i, len(src)):
        if src[j] == "(":
            depth += 1
        elif src[j] == ")":
            depth -= 1
            if depth == 0:
                return j + 1
    raise SystemExit("unbalanced parens at %d" % i)


def rewrite(src: str) -> str:
    out = []
    pos = 0
    while True:
        k = src.find("<<<", pos)
        if k < 0:
            out.append(src[pos:])
            break
        # skip launches inside // comments (renderFunctions.cu keeps
        # commented-out render_pose_website<<<...>>> variants around)
        line_start = src.rfind("\n", 0, k) + 1
        if "//" in src[line_start:k]:
            out.append(src[pos : k + 3])
            pos = k + 3
            continue
        # kernel name: identifier immediately before <<<
        m = re.search(r"([A-Za-z_]\w*)\s*$", src[pos:k])
        assert m, "no kernel name before <<<"
        name = m.group(1)
        out.append(src[pos : pos + m.start(1)])
        close = src.find(">>>", k)
        assert close >= 0, "unterminated <<<"
        grid_block = src[k + 3 : close].strip()
        i = close + 3
        while src[i].isspace():
            i += 1
        assert src[i] == "(", "expected ( after >>>"
        j = match_paren(src, i)
        args = src[i + 1 : j - 1]
        while src[j].isspace():
            j += 1
        assert src[j] == ";", "expected ; after launch"
        fn = (
            "launch_block_threads"
            if kernel_uses_syncthreads(src, name)
            else "launch_serial"
        )
        out.append(
            "::cuda_emu::%s(%s, [&]{ %s(%s); });" % (fn, grid_block, name, args)
        )
        pos = j + 1
    return "".join(out)


def main() -> None:
    inp, outp = sys.argv[1], sys.argv[2]
    with open(inp) as f:
        src = f.read()
    with open(outp, "w") as f:
        f.write('#line 1 "%s"\n' % inp)
        f.write(rewrite(src))


if __name__ == "__main__":
    main()
