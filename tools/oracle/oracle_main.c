/* Minimal driver for the reference aligner core, used ONLY as a golden-output
 * test oracle and CPU baseline for the biscuit_tpu framework. It links the
 * unmodified sources under /root/reference/lib/aln (read in place; nothing is
 * copied into this repository) and exposes the `index` and `align` subcommands,
 * which do not depend on htslib. */
#include <stdio.h>
#include <string.h>

int main_biscuit_index(int argc, char *argv[]);
int main_align(int argc, char *argv[]);

int main(int argc, char *argv[]) {
    if (argc < 2) {
        fprintf(stderr, "Usage: oracle_biscuit <index|align> [options]\n");
        return 1;
    }
    if (strcmp(argv[1], "index") == 0) return main_biscuit_index(argc - 1, argv + 1);
    if (strcmp(argv[1], "align") == 0) return main_align(argc - 1, argv + 1);
    fprintf(stderr, "Unknown subcommand: %s\n", argv[1]);
    return 1;
}
