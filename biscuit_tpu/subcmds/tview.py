"""biscuit tview port (/root/reference/src/tview.c): text alignment viewer
with bisulfite coloring (retention RED, conversion BLUE, other mismatch
YELLOW), YD-aware, dot/comma match display with bisulfite-exempt cytosines.

Interactive curses UI plus a non-interactive --dump mode for headless use.
"""
import getopt
import sys
from typing import List, Optional

from ..io.sambam import AlignmentFile, AlnRecord, FLAG_REVERSE, FLAG_UNMAP
from ..pileup.common import RefCache, get_bsstrand

ATTR_NONE, ATTR_RET, ATTR_CONV, ATTR_MISMATCH = 0, 1, 2, 3


class ReadRow:
    def __init__(self, rec: AlnRecord, bss: int):
        self.rec = rec
        self.bss = bss
        self.end = rec.pos + rec.rlen()


def _layout(reads: List[ReadRow]) -> List[List[ReadRow]]:
    rows: List[List[ReadRow]] = []
    ends: List[int] = []
    for r in sorted(reads, key=lambda x: x.rec.pos):
        placed = False
        for i, e in enumerate(ends):
            if r.rec.pos > e + 1:
                rows[i].append(r)
                ends[i] = r.end
                placed = True
                break
        if not placed:
            rows.append([r])
            ends.append(r.end)
    return rows


def _render_read(r: ReadRow, left: int, width: int, rs: RefCache, chrm: str,
                 is_dot: bool):
    """Returns list of (col, char, attr) for the visible window."""
    rec = r.rec
    out = []
    rpos = rec.pos + 1  # 1-based
    qpos = 0
    rev = bool(rec.flag & FLAG_REVERSE)
    seq = rec.seq
    for op, oplen in rec.cigar:
        if op in (0, 7, 8):
            for j in range(oplen):
                col = rpos + j - left
                if col < 0 or col >= width:
                    continue
                qb = (seq[qpos + j] if qpos + j < len(seq) else "N").upper()
                rb = rs.getbase_upcase(rpos + j)
                attr = ATTR_NONE
                isconv = False
                if rb == "G" and r.bss == 1:
                    if qb == "G":
                        attr = ATTR_RET
                    elif qb == "A":
                        attr = ATTR_CONV
                        isconv = True
                elif rb == "C" and r.bss == 0:
                    if qb == "C":
                        attr = ATTR_RET
                    elif qb == "T":
                        attr = ATTR_CONV
                        isconv = True
                if not isconv and qb != rb and attr != ATTR_RET:
                    attr = ATTR_MISMATCH
                exempt = (r.bss == 0 and rb == "C") or (r.bss == 1 and rb == "G")
                if is_dot and qb == rb and not exempt:
                    ch = "," if rev else "."
                else:
                    ch = qb.upper() if rev else qb.lower()
                out.append((col, ch, attr))
            rpos += oplen
            qpos += oplen
        elif op == 1 or op == 4:
            qpos += oplen
        elif op == 2:
            for j in range(oplen):
                col = rpos + j - left
                if 0 <= col < width:
                    out.append((col, "*", ATTR_NONE))
            rpos += oplen
        elif op == 5:
            pass
    return out


def _window(bam, rs, hdr, tid, left, width, min_mapq=0):
    chrm = hdr.names[tid]
    rs.fetch(chrm, max(1, left - 100), left + width + 100)
    reads = []
    for rec in bam.fetch(tid, max(0, left - 1), left + width):
        if rec.flag & FLAG_UNMAP:
            continue
        if rec.mapq < min_mapq:
            continue
        bss = get_bsstrand(rs, rec, 20, 0)
        reads.append(ReadRow(rec, bss))
    ref_line = "".join(rs.getbase_upcase(left + i) for i in range(width))
    rows = _layout(reads)
    grid = []
    for row in rows:
        cells: List = [(" ", ATTR_NONE)] * width
        for r in row:
            for col, ch, attr in _render_read(r, left, width, rs, chrm, True):
                cells[col] = (ch, attr)
        grid.append(cells)
    return ref_line, grid


def dump_view(bam, rs, hdr, tid, left, width, out=sys.stdout):
    ref_line, grid = _window(bam, rs, hdr, tid, left, width)
    out.write(f"{hdr.names[tid]}:{left}-{left + width - 1}\n")
    out.write(ref_line + "\n")
    for cells in grid:
        out.write("".join(c[0] for c in cells).rstrip() + "\n")


def curses_view(bam, rs, hdr, tid, pos):
    import curses

    def main(scr):
        curses.start_color()
        curses.use_default_colors()
        curses.init_pair(1, curses.COLOR_BLUE, -1)    # conversion
        curses.init_pair(2, curses.COLOR_RED, -1)     # retention
        curses.init_pair(3, curses.COLOR_YELLOW, -1)  # mismatch
        attr_map = {ATTR_NONE: 0, ATTR_RET: curses.color_pair(2),
                    ATTR_CONV: curses.color_pair(1),
                    ATTR_MISMATCH: curses.color_pair(3)}
        left = pos
        t = tid
        msg = ""
        while True:
            h, w = scr.getmaxyx()
            width = w - 1
            scr.erase()
            ref_line, grid = _window(bam, rs, hdr, t, left, width)
            scr.addstr(0, 0, f"{hdr.names[t]}:{left}  (q quit, g goto, h/l scroll) {msg}"[:width])
            scr.addstr(1, 0, ref_line[:width])
            for i, cells in enumerate(grid[:h - 3]):
                for col, (ch, a) in enumerate(cells):
                    if ch != " ":
                        try:
                            scr.addch(i + 2, col, ch, attr_map[a])
                        except curses.error:
                            pass
            scr.refresh()
            c = scr.getch()
            if c in (ord("q"), 27):
                break
            elif c in (ord("l"), curses.KEY_RIGHT):
                left += width // 2
            elif c in (ord("h"), curses.KEY_LEFT):
                left = max(1, left - width // 2)
            elif c == ord("g"):
                curses.echo()
                scr.addstr(h - 1, 0, "goto: ")
                s = scr.getstr(h - 1, 6, 40).decode()
                curses.noecho()
                try:
                    if ":" in s:
                        name, p = s.split(":")
                        t2 = hdr.name2tid(name)
                        if t2 >= 0:
                            t = t2
                            left = max(1, int(p.replace(",", "")))
                    else:
                        left = max(1, int(s.replace(",", "")))
                    msg = ""
                except ValueError:
                    msg = f"bad region {s}"
            elif c == ord("?"):
                msg = "keys: q quit | g goto | h/l scroll"

    import curses
    curses.wrapper(main)


def main(argv):
    reg = None
    dump = False
    width = 80
    opts, args = getopt.getopt(argv, "g:dw:h")
    for o, a in opts:
        if o == "-g":
            reg = a
        elif o == "-d":
            dump = True
        elif o == "-w":
            width = int(a)
        elif o == "-h":
            print("Usage: biscuit_tpu tview [-g chr:pos] [-d] <ref.fa> <in.bam>",
                  file=sys.stderr)
            return 1
    if len(args) < 2:
        print("Please provide reference and input bam.", file=sys.stderr)
        return 1
    rs = RefCache(args[0])
    bam = AlignmentFile(args[1])
    hdr = bam.header
    tid, pos = 0, 1
    if reg:
        if ":" in reg:
            name, p = reg.split(":", 1)
            tid = hdr.name2tid(name)
            pos = max(1, int(p.split("-")[0].replace(",", "")))
        else:
            tid = hdr.name2tid(reg)
    if tid < 0:
        print(f"Unknown contig in region {reg}", file=sys.stderr)
        return 1
    if dump or not sys.stdout.isatty():
        dump_view(bam, rs, hdr, tid, pos, width)
        return 0
    curses_view(bam, rs, hdr, tid, pos)
    return 0
