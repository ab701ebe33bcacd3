/* Entry point for the downstream test-oracle binary: dispatches to the
 * reference BAM-downstream subcommand mains (/root/reference/src, compiled
 * in place against the local htslib-API shim). tview is omitted (ncurses
 * interactive viewer — not part of text-output parity testing). Test
 * tooling only — not part of the biscuit_tpu framework. */
#include <stdio.h>
#include <string.h>

int main_pileup(int argc, char *argv[]);
int main_vcf2bed(int argc, char *argv[]);
int main_epiread(int argc, char *argv[]);
int main_asm(int argc, char *argv[]);
int main_bsstrand(int argc, char *argv[]);
int main_cinread(int argc, char *argv[]);
int main_bsconv(int argc, char *argv[]);
int main_mergecg(int argc, char *argv[]);
int main_rectangle(int argc, char *argv[]);
int main_qc(int argc, char *argv[]);
int main_bc(int argc, char *argv[]);

int main(int argc, char *argv[]) {
    if (argc < 2) {
        fprintf(stderr, "Usage: oracle_down <subcommand> [options]\n");
        return 1;
    }
    if (strcmp(argv[1], "pileup") == 0) return main_pileup(argc-1, argv+1);
    if (strcmp(argv[1], "vcf2bed") == 0) return main_vcf2bed(argc-1, argv+1);
    if (strcmp(argv[1], "epiread") == 0) return main_epiread(argc-1, argv+1);
    if (strcmp(argv[1], "asm") == 0) return main_asm(argc-1, argv+1);
    if (strcmp(argv[1], "bsstrand") == 0) return main_bsstrand(argc-1, argv+1);
    if (strcmp(argv[1], "cinread") == 0) return main_cinread(argc-1, argv+1);
    if (strcmp(argv[1], "bsconv") == 0) return main_bsconv(argc-1, argv+1);
    if (strcmp(argv[1], "mergecg") == 0) return main_mergecg(argc-1, argv+1);
    if (strcmp(argv[1], "rectangle") == 0) return main_rectangle(argc-1, argv+1);
    if (strcmp(argv[1], "qc") == 0) return main_qc(argc-1, argv+1);
    if (strcmp(argv[1], "bc") == 0) return main_bc(argc-1, argv+1);
    fprintf(stderr, "Unknown subcommand: %s\n", argv[1]);
    return 1;
}
