/*
 * msac_trace — ptrace-based tracer for dav1d's internal msac decode calls.
 *
 * Runs a target program (av1_tool decode ...), sets INT3 breakpoints at a
 * list of code offsets inside libdav1d, and logs for every hit: the offset,
 * n_symbols (rdx), the cdf contents (rsi), and the msac context state
 * (rdi -> dif/rng/cnt).  Used to recover the exact symbol/cdf call sequence
 * of the reference decoder for conformance debugging.
 *
 * usage: msac_trace <libname-substr> <hexoff1,hexoff2,...> -- <cmd...>
 */
#define _GNU_SOURCE
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <stdint.h>
#include <sys/ptrace.h>
#include <sys/wait.h>
#include <sys/user.h>
#include <unistd.h>
#include <errno.h>

static pid_t child;

static uint64_t lib_base(pid_t pid, const char *name) {
    char path[64], line[512];
    snprintf(path, sizeof path, "/proc/%d/maps", pid);
    FILE *f = fopen(path, "r");
    if (!f) return 0;
    uint64_t base = 0;
    while (fgets(line, sizeof line, f)) {
        if (strstr(line, name)) {
            base = strtoull(line, NULL, 16);
            break;
        }
    }
    fclose(f);
    return base;
}

static long peek(uint64_t addr) {
    errno = 0;
    return ptrace(PTRACE_PEEKDATA, child, (void *)addr, NULL);
}

int main(int argc, char **argv) {
    const char *libname = argv[1];
    char *offs_str = strdup(argv[2]);
    char **cmd = &argv[4];

    uint64_t offs[64];
    int noffs = 0;
    for (char *tok = strtok(offs_str, ","); tok; tok = strtok(NULL, ","))
        offs[noffs++] = strtoull(tok, NULL, 16);

    child = fork();
    if (child == 0) {
        ptrace(PTRACE_TRACEME, 0, NULL, NULL);
        execvp(cmd[0], cmd);
        perror("exec");
        exit(127);
    }
    int status;
    waitpid(child, &status, 0);
    ptrace(PTRACE_SETOPTIONS, child, NULL, (void *)PTRACE_O_EXITKILL);

    /* single-step through the dynamic loader until the lib is mapped */
    uint64_t base = 0;
    /* cheaper: set breakpoint on main-ish by just single stepping in chunks */
    while (!base) {
        for (int i = 0; i < 20000; i++) {
            if (ptrace(PTRACE_SINGLESTEP, child, NULL, NULL) < 0) goto done;
            waitpid(child, &status, 0);
            if (WIFEXITED(status)) goto done;
        }
        base = lib_base(child, libname);
    }
    fprintf(stderr, "# base %lx\n", base);

    /* install breakpoints */
    long orig[64];
    for (int i = 0; i < noffs; i++) {
        uint64_t a = base + offs[i];
        orig[i] = peek(a);
        long patched = (orig[i] & ~0xffL) | 0xcc;
        ptrace(PTRACE_POKEDATA, child, (void *)a, (void *)patched);
    }

    long hits = 0;
    ptrace(PTRACE_CONT, child, NULL, NULL);
    while (1) {
        waitpid(child, &status, 0);
        if (WIFEXITED(status)) break;
        if (!WIFSTOPPED(status) || WSTOPSIG(status) != SIGTRAP) {
            ptrace(PTRACE_CONT, child, NULL,
                   (void *)(long)(WIFSTOPPED(status) ? WSTOPSIG(status) : 0));
            continue;
        }
        struct user_regs_struct regs;
        ptrace(PTRACE_GETREGS, child, NULL, &regs);
        uint64_t rip = regs.rip - 1;
        int idx = -1;
        for (int i = 0; i < noffs; i++)
            if (rip == base + offs[i]) { idx = i; break; }
        if (idx < 0) {
            ptrace(PTRACE_CONT, child, NULL, NULL);
            continue;
        }
        hits++;
        /* log: offset, rdx (n), msac ctx (rdi): dif,rng,cnt; cdf (rsi) */
        uint64_t ctx = regs.rdi, cdf = regs.rsi, n = regs.rdx;
        uint64_t dif = peek(ctx + 0x10);
        uint64_t rng_cnt = peek(ctx + 0x18);
        printf("%llx n=%llu dif=%llx rng=%u cnt=%d cdf=",
               (unsigned long long)offs[idx], (unsigned long long)n,
               (unsigned long long)dif, (uint32_t)rng_cnt,
               (int32_t)(rng_cnt >> 32));
        int vals = (n > 16 ? 4 : (int)n + 1);
        for (int i = 0; i < vals; i += 4) {
            long w = peek(cdf + 2 * i);
            for (int j = 0; j < 4 && i + j < vals; j++)
                printf("%u,", (uint16_t)(w >> (16 * j)));
        }
        printf("\n");
        /* step over: restore, singlestep, re-arm */
        uint64_t a = base + offs[idx];
        ptrace(PTRACE_POKEDATA, child, (void *)a, (void *)orig[idx]);
        regs.rip = a;
        ptrace(PTRACE_SETREGS, child, NULL, &regs);
        ptrace(PTRACE_SINGLESTEP, child, NULL, NULL);
        waitpid(child, &status, 0);
        if (WIFEXITED(status)) break;
        long patched = (orig[idx] & ~0xffL) | 0xcc;
        ptrace(PTRACE_POKEDATA, child, (void *)a, (void *)patched);
        ptrace(PTRACE_CONT, child, NULL, NULL);
    }
done:
    fprintf(stderr, "# hits %ld\n", hits);
    return 0;
}
